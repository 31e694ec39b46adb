package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** THE idempotent foreachBatch parquet sink: write a micro-batch's
  * rows under their batch_id partition with dynamic overwrite, so an
  * at-least-once replay (crash between write and checkpoint commit)
  * REPLACES its own partition instead of appending duplicates. One
  * home for the recipe — s19, s20, and compositions all route here;
  * the mode/option/partitionBy triple is idempotence-critical and
  * must not fork. */
object IdempotentSink {

  def putBatch(df: DataFrame, batchId: Long, dir: String,
      format: String = "parquet"): Unit =
    df.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .format(format)
      .save(dir)
}
