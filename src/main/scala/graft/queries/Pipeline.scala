package graft.queries

import graft.T._
import graft.functions.MinHashLsh
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-data curation pipeline (north-star extension):
  * the composition a real corpus-prep job runs, built entirely from
  * operators already verified individually — the point of this query
  * is that the COMPOSITION is oracle-checked, not just the stages.
  *
  * Stages (in the order a production pipeline applies them):
  *  1. quality gate  — q33's composite score ≥ 0.6 (chosen INSIDE the
  *     test corpus's observed quality range 0.47-0.74, so the gate
  *     provably drops documents at every sf — a threshold below the
  *     minimum would verify vacuously)
  *  2. exact dedup   — q35's position-weighted fingerprint, keep the
  *     min doc_id per fingerprint among quality survivors
  *  3. near-dup drop — q28's MinHash/LSH candidates restricted to
  *     survivors; GREEDY rule: any doc that is the larger id (db) of
  *     a candidate pair is dropped (deterministic and one-pass; full
  *     cluster resolution is q48's job and overkill mid-pipeline)
  *  4. deterministic sample — keep phash("sample:" ++ doc_id) % 2 = 0
  *     (reproducible 50%, the q47 mechanism)
  *
  * Scale posture: every stage is a filter/agg/equality-join over
  * hash-partitionable keys (fp, (band, sig), doc_id); no stage
  * introduces a shuffle shape the component queries don't already
  * have, so the pipeline inherits their 100 TB posture.
  */
object Pipeline {

  private def q55(s: SparkSession, d: String): DataFrame = {
    // 1. quality gate (q33 columns: doc_id, n_tokens, ..., quality)
    val quality = TextAnalysis.q33(s, d)
      .select(col("doc_id"), col("n_tokens"), col("quality"))
      .filter(col("quality") >= 0.6)
    // 2. exact dedup among survivors: min doc_id per fingerprint
    val fp = TextAnalysis.q35(s, d).select(col("doc_id"), col("fp"))
    val wFp = Window.partitionBy("fp").orderBy(col("doc_id").asc)
    val exactKept = quality.join(fp, Seq("doc_id"))
      .withColumn("rn", row_number().over(wFp))
      .filter(col("rn") === 1)
      .drop("rn", "fp")
    // 3. near-dup drop: LSH candidate pairs among survivors, drop db.
    // Survivor filter BEFORE the signature build — the md5+minhash
    // work is the pipeline's dominant CPU cost and must not be spent
    // on documents stages 1-2 already dropped (the oracle filters
    // before hashing too).
    // gauge = the raw scan: the survivor join upstream would make
    // `.rdd` on the input itself execute AQE stages (see T.spread).
    // Band structure derives from the FULL corpus count exactly like
    // q28 (one scheme; survivors are a subset, so 0.1% of the band
    // choice's input is noise either way), mirrored in the oracle.
    val nDocs = tbl(s, d, "documents").groupBy()
      .agg(count(lit(1)).as("n_corpus"))
    val sigs = MinHashLsh.bandSignatures(
        withScalar(
          spread(tbl(s, d, "documents")
            .join(exactKept.select(col("doc_id")), Seq("doc_id")),
            col("doc_id"), gauge = tbl(s, d, "documents")),
          nDocs),
        lit(4) + when(col("n_corpus") > 8000, 4).otherwise(0))
      .repartition(col("band"), col("sig"))
    val dropped = sigs.select(col("doc_id").as("da"), col("band"), col("sig"))
      .join(sigs.select(col("doc_id").as("db"), col("band").as("band_b"),
        col("sig").as("sig_b")),
        col("band") === col("band_b") && col("sig") === col("sig_b") &&
          col("da") < col("db"))
      .select(col("db").as("doc_id")).distinct()
    val nearKept = exactKept.join(dropped, Seq("doc_id"), "left_anti")
    // 4. deterministic 50% sample + stable output
    val docs = tbl(s, d, "documents").select(col("doc_id"), col("lang"))
    nearKept
      .filter(phash(concat(lit("sample:"), col("doc_id").cast("string"))) % 2 === 0)
      .join(docs, Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("quality"))
      .orderBy("doc_id")
  }

  /** The oracle rebuilds each stage with the SAME fragments the
    * component oracles use (q33's score, q35's fingerprint, q28's
    * minhash bands, q47's hash-mod sample) and chains them. */
  private val q55Sql =
    s"""WITH t AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok,
      |                  generate_subscripts(string_split(text,' '),1) AS ord FROM documents),
      |st AS (
      |  SELECT doc_id, count(*) AS n_tokens, count(DISTINCT tok) AS n_distinct,
      |         sum(length(tok)) AS tok_chars,
      |         sum(CASE WHEN tok IN ('the','a','and','of','to','in') THEN 1 ELSE 0 END) AS n_stop
      |  FROM t GROUP BY doc_id),
      |quality AS (
      |  SELECT doc_id, n_tokens,
      |         0.4 * (CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE))
      |             + 0.3 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
      |             + 0.3 * (1.0 - CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)) AS quality
      |  FROM st),
      |q AS (SELECT * FROM quality WHERE quality >= 0.6),
      |fp AS (SELECT doc_id, sum((${phashSql("tok")} * ord) % 1000000007) % 1000000007 AS fp
      |       FROM t GROUP BY doc_id),
      |exact_kept AS (
      |  SELECT doc_id, n_tokens, quality FROM (
      |    SELECT q.doc_id, q.n_tokens, q.quality,
      |           row_number() OVER (PARTITION BY fp.fp ORDER BY q.doc_id ASC) AS rn
      |    FROM q JOIN fp ON q.doc_id = fp.doc_id)
      |  WHERE rn = 1),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |         tok || ' ' || lead(tok) OVER w || ' ' || lead(tok,2) OVER w AS shingle
      |  FROM t WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
      |  QUALIFY lead(tok,2) OVER w IS NOT NULL),
      |h AS (SELECT doc_id, ${phashSql("shingle")} AS h FROM sh
      |      WHERE doc_id IN (SELECT doc_id FROM exact_kept)),
      |mh AS (
      |  SELECT doc_id, i, min((h*(2*i+1) + 7919*i + 13) % 4294967311) AS mh
      |  FROM h CROSS JOIN generate_series(0,15) AS g(i) GROUP BY doc_id, i),
      |bw AS (
      |  SELECT CASE WHEN count(*) > 8000 THEN 8 ELSE 4 END AS r FROM documents),
      |sigs AS (
      |  SELECT doc_id, i//r AS band, string_agg(mh::VARCHAR, '-' ORDER BY i) AS sig
      |  FROM mh, bw GROUP BY doc_id, i//r),
      |dropped AS (
      |  SELECT DISTINCT b.doc_id
      |  FROM sigs a JOIN sigs b
      |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
      |near_kept AS (
      |  SELECT * FROM exact_kept WHERE doc_id NOT IN (SELECT doc_id FROM dropped))
      |SELECT k.doc_id, dd.lang, CAST(k.n_tokens AS BIGINT) AS n_tokens, k.quality
      |FROM near_kept k JOIN documents dd ON k.doc_id = dd.doc_id
      |WHERE ${phashSql("'sample:' || k.doc_id")} % 2 = 0
      |ORDER BY k.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q55_curation_pipeline" -> q55 _)

  val oracles: Map[String, String] = Map(
    "q55_curation_pipeline" -> q55Sql)
}
