package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DotProduct matches the HOF fold it replaces — including the null
  * and length-mismatch poisoning semantics. */
class VectorExpressionsSpec extends SparkSpec {

  private def viaHof = aggregate(
    zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0),
    (acc, x) => acc + x)

  test("dot_product agrees with aggregate(zip_with) on clean and dirty input") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val df = Seq(
      (Seq[java.lang.Double](1.0, 2.0, 3.0), Seq[java.lang.Double](4.0, 5.0, 6.0)),
      (Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](4.0, 5.0, 6.0)),
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](4.0, 5.0, 6.0))
    ).toDF("a", "b")
    val rows = df.select(
      expr("dot_product(a, b)").as("native"), viaHof.as("hof")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1),
        s"null disagreement: $r")
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
    }
    assert(!rows(0).isNullAt(0) && rows(0).getDouble(0) == 32.0)
    assert(rows(1).isNullAt(0)) // null element poisons
    assert(rows(2).isNullAt(0)) // length mismatch poisons
  }
}
