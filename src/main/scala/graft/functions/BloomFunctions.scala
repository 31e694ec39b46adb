package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Registration for Spark's built-in (but non-SQL-registered) bloom
  * filter expressions — the sketch behind Spark's own runtime-filter
  * join optimization (`InjectRuntimeFilter`), exposed here as callable
  * SQL functions for explicit bloom pre-joins (q84):
  *
  *  - `bloom_agg(hash, estItems, numBits)` → binary: a mergeable
  *    bloom filter over xxhash64-style long hashes. It aggregates
  *    with map-side partials (ObjectHashAggregate) and merges the
  *    fixed-size bitsets in a SinglePartition reduce — shuffle volume
  *    is O(numBits), independent of row count, exactly like a sketch
  *    aggregate should be.
  *  - `bloom_might_contain(bloom, hash)` → boolean: the codegen'd
  *    probe. Catalyst requires the bloom side to be a constant or a
  *    scalar subquery (it is evaluated once per task, not per row),
  *    which is why q84 phrases the probe through a scalar subquery.
  *
  * Both are Spark classes (`BloomFilterAggregate`,
  * `BloomFilterMightContain`) — no sketch code of our own to get
  * wrong; we only provide the registry plumbing, like
  * [[VectorFunctions]] does for `dot_product`.
  */
object BloomFunctions {

  val bloomAggBuilder: Seq[Expression] => Expression = exprs => {
    if (exprs.length != 3)
      throw new IllegalArgumentException(
        s"bloom_agg expects (hash, estItems, numBits), got ${exprs.length} args")
    BloomFilterAggregate(exprs(0), exprs(1), exprs(2), 0, 0)
  }

  val mightContainBuilder: Seq[Expression] => Expression = exprs => {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"bloom_might_contain expects (bloom, hash), got ${exprs.length} args")
    BloomFilterMightContain(exprs.head, exprs(1))
  }

  /** Session-registry route (idempotent); mirrored by
    * [[graft.GraftExtensions]] for conf-installed sessions. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("bloom_agg", bloomAggBuilder, "built-in")
    reg.createOrReplaceTempFunction(
      "bloom_might_contain", mightContainBuilder, "built-in")
  }
}
