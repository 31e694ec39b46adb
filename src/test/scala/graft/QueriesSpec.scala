package graft

import org.apache.spark.sql.types._

/** Every registered query runs on sf0.001, returns rows, and respects
  * the oracle-parity type discipline (string/bigint/double/boolean
  * outputs only — see T.scala scaladoc). The exact value parity vs
  * DuckDB is the driver's job (and tools/check.py locally); this suite
  * guards the contract shape.
  */
class QueriesSpec extends SparkSpec {

  private val allowed: Set[DataType] =
    Set(StringType, LongType, DoubleType, BooleanType)

  test("every query has an oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
    val orphan = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphan.isEmpty, s"oracles without query: $orphan")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs, returns rows, normalized schema") {
      val df = fn(spark, sfDir)
      val bad = df.schema.filterNot(f => allowed.contains(f.dataType))
      assert(bad.isEmpty,
        s"$name emits non-normalized columns: ${bad.map(f => s"${f.name}:${f.dataType}")}")
      assert(df.count() > 0, s"$name returned 0 rows at sf0.001")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
