package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the batch operator inventory of SURVEY.md §2.3 (the
  * reference's dataflow capabilities re-expressed over the driver's
  * test tables) plus the north-star training-data-pipeline extensions;
  * `oracleSql` carries the DuckDB twin of each query for the driver's
  * hash-compare at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. Composes the reference's core dataflow shape: filter
    * (event-type gate, spot_trades_etl.py:47) → conditional map
    * (side labeling, :54) → tumbling 1-day OHLCV-style aggregation
    * over the event stream table. */
  def entry(spark: SparkSession): DataFrame =
    T.tbl(spark, "/root/testdata/sf0.001", "events")
      .filter(col("event_type").isin("purchase", "view", "click"))
      .withColumn("side", when(col("value") >= 100.0, "sell").otherwise("buy"))
      .groupBy(date_trunc("day", col("ts")).as("day"), col("side"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("volume"),
        min(col("value")).as("low"),
        max(col("value")).as("high"))
      .orderBy("day", "side")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.TimeSeries.queries ++
      graft.queries.Dedup.queries ++
      graft.queries.Similarity.queries ++
      graft.queries.TextAnalysis.queries ++
      graft.queries.Multimodal.queries ++
      graft.queries.Extras.queries ++
      graft.queries.Corpus.queries ++
      graft.queries.Curation.queries ++
      graft.queries.Pipeline.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.TimeSeries.oracles ++
      graft.queries.Dedup.oracles ++
      graft.queries.Similarity.oracles ++
      graft.queries.TextAnalysis.oracles ++
      graft.queries.Multimodal.oracles ++
      graft.queries.Extras.oracles ++
      graft.queries.Corpus.oracles ++
      graft.queries.Curation.oracles ++
      graft.queries.Pipeline.oracles
}
