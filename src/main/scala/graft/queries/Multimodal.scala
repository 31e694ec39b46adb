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
      .orderBy("doc_id")

  private val q36Sql =
    s"""SELECT doc_id, source,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |       md5(text) AS content_md5,
      |       ${phashSql("text")} % 640 AS width,
      |       ${phashSql("text || 'x'")} % 480 AS height,
      |       n_chars % 30 + 1 AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_multimodal_features" -> q36 _)

  val oracles: Map[String, String] = Map(
    "q36_multimodal_features" -> q36Sql)
}
