package graft.queries

import graft.T._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q36: multimodal binary-column features (north-star extension).
  *
  * Multimodal corpora carry media as opaque `binary` columns with
  * typed metadata. The driver's tables have no binary column, so the
  * documents' UTF-8 bytes stand in for media payloads: the query
  * exercises the real Spark-side surface — binary encode, byte length,
  * content hashing, deterministic metadata derivation — all codegen'd.
  * The decode/resize/frame-sample path (which needs media libs this
  * container lacks) lives in [[graft.multimodal.MultimodalPipeline]]
  * with a deterministic stub decoder and its own tests.
  */
object Multimodal {

  private def q36(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "documents")
      .select(col("doc_id"), col("source"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        md5(encode(col("text"), "UTF-8")).as("content_md5"),
        (phash(col("text")) % 640).as("width"),
        (phash(concat(col("text"), lit("x"))) % 480).as("height"),
        (col("n_chars") % 30 + 1).as("n_frames"))
      // the triple text-hash lineage is shuffle-free — pin the slim
      // feature rows so the sort's sampling job re-reads shuffle files
      // instead of re-hashing the corpus (see graft.T.pinnedSort)
      .transform(graft.T.pinnedSort(_, "doc_id"))

  private val q36Sql =
    s"""SELECT doc_id, source,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |       md5(text) AS content_md5,
      |       ${phashSql("text")} % 640 AS width,
      |       ${phashSql("text || 'x'")} % 480 AS height,
      |       n_chars % 30 + 1 AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q68: frame-sampling manifest — the planning half of distributed
    * frame extraction: each media row explodes into one row per
    * SAMPLED frame (stride 3 over q36's n_frames metadata) carrying
    * the frame timestamp and a deterministic task bucket. A decode
    * fleet (the stub-codec pipeline in
    * [[graft.multimodal.MultimodalPipeline]]) consumes this manifest
    * partitioned by task_bucket, so decode work spreads uniformly
    * regardless of media-length skew — one long video cannot pin an
    * executor, because its frames hash across all buckets. Manifest
    * generation is a row-local explode; the final ORDER BY (one sort
    * shuffle) exists for oracle parity only — a decode consumer
    * repartitions by task_bucket instead of sorting. */
  private def q68(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "documents")
      .select(col("doc_id").as("media_id"),
        (col("n_chars") % 30 + 1).as("n_frames"))
      .select(col("media_id"),
        explode(sequence(lit(0L), col("n_frames") - 1L)).as("frame_idx"))
      .filter(col("frame_idx") % 3 === 0)
      .select(col("media_id"), col("frame_idx"),
        (col("frame_idx") * 1000L).as("frame_ms"),
        (phash(concat(col("media_id").cast("string"), lit(":"),
          col("frame_idx").cast("string"))) % 32).as("task_bucket"))
      .orderBy("media_id", "frame_idx")

  private val q68Sql =
    s"""WITH m AS (
      |  SELECT doc_id AS media_id, n_chars % 30 + 1 AS n_frames FROM documents),
      |f AS (
      |  SELECT media_id,
      |         unnest(generate_series(0, n_frames - 1)) AS frame_idx
      |  FROM m)
      |SELECT media_id, frame_idx, frame_idx * 1000 AS frame_ms,
      |       ${phashSql("media_id || ':' || frame_idx")} % 32 AS task_bucket
      |FROM f WHERE frame_idx % 3 = 0
      |ORDER BY media_id, frame_idx""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_multimodal_features" -> q36 _,
    "q68_frame_manifest" -> q68 _)

  val oracles: Map[String, String] = Map(
    "q36_multimodal_features" -> q36Sql,
    "q68_frame_manifest" -> q68Sql)
}
