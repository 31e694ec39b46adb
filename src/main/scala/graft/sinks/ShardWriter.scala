package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard publisher — the write half the batch inventory's
  * read-side queries assume: lay a corpus out as
  * `outDir/<col>=<value>/part-*.parquet` with a bounded row count per
  * file, then report what actually landed. Partition-directory layout
  * is what makes the read side's partition pruning work (proven in
  * ScaleSpec); the per-file bound is what keeps a downstream loader's
  * unit of work (one file) schedulable regardless of how skewed the
  * partition column is — q63 plans shard ASSIGNMENT as a query; this
  * executes a layout.
  *
  * The manifest is read back from the landed files, not echoed from
  * the request: a publisher that reports its own intent hides
  * truncated/failed writes, so the audit must trust only the
  * filesystem (the s20 discipline applied to the write side).
  */
object ShardWriter {

  /** Write `df` partitioned by `partitionCol`, each file capped at
    * `maxRecordsPerFile` rows, and return the landed [[manifest]]. */
  def publish(df: DataFrame, outDir: String, partitionCol: String,
      maxRecordsPerFile: Long): DataFrame = {
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(outDir)
    manifest(df.sparkSession, outDir, partitionCol, df.schema)
  }

  /** The landed layout: one row per data file — partition value, file
    * path, row count — aggregated from the files themselves. The
    * schema is passed EXPLICITLY: a fully-gated (empty) publish lands
    * only _SUCCESS, where schema inference throws — an empty corpus
    * must report an empty manifest, not abort the pipeline. */
  def manifest(spark: SparkSession, outDir: String, partitionCol: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).parquet(outDir)
      .groupBy(col(partitionCol), input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"))
}
