package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialized shared-core API — the production shape for the ~6-7s
  * of deliberate per-query re-derivation BASELINE.md's shared-core
  * cost table documents. The batch inventory keeps every query
  * self-contained (per-query independence IS the verification
  * contract: each query must hash-match its oracle with no hidden
  * state), but a production pipeline computes the expensive shared
  * cores ONCE per corpus snapshot and fans consumers out over the
  * files — exactly the pattern s19's static index already proves for
  * streaming ingest. This object is that pattern for the batch side:
  * one `materialize` call per corpus snapshot, then any number of
  * consumer runs (dedup clustering, cluster keep, per-source audit,
  * ANN serving) read the parquet.
  *
  * Written cores are ROUND-ROBIN SHARDED, not clustered by their key:
  * DedupScaleSpec's skew-lever test shows AQE can only split a hot
  * key's partition when its rows span multiple map tasks — a
  * key-clustered file layout puts each hot key in one file and makes
  * the skew structurally unsplittable for every downstream self-join.
  *
  * CoresParitySpec proves consumer outputs over the materialized cores
  * are row-identical to the self-contained queries; graft.CoresBench
  * measures the amortization (numbers in BASELINE.md round 6).
  */
object Cores {

  /** Write the three expensive shared cores for corpus `d` under
    * `dir`: the capped exact-Jaccard near-dup pairs (q25's core,
    * consumed by q48/q70/q80/q100), the banded MinHash candidate pairs
    * (q28's core, consumed by the LSH family and q88's calibration),
    * and the learned Lloyd's centroids (the IVF index behind
    * q31/q52/q97). Pairs and candidates shard round-robin (see class
    * doc); the ≤8-row centroid table is a single file. */
  def materialize(s: SparkSession, d: String, dir: String,
      shards: Int = 8): Unit = {
    materializePairs(s, d, dir, shards)
    materializeLsh(s, d, dir, shards)
    Similarity.lloydCentroids(s, d).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/lloyd_centroids.parquet")
  }

  /** Just the pair core — what the q48/q70/q80 consumer family needs
    * (CoresBench times this against their self-contained forms). */
  def materializePairs(s: SparkSession, d: String, dir: String,
      shards: Int = 8): Unit =
    Dedup.nearDupPairs(s, d).repartition(shards)
      .write.mode("overwrite").parquet(s"$dir/near_dup_pairs.parquet")

  /** (da, db, jaccard) — q25's near-dup pairs, read from `dir`. */
  def nearDupPairs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/near_dup_pairs.parquet")

  /** Just the LSH candidate core — what the q55/q88 consumer family
    * reads (CoresBench times this against their self-contained forms,
    * round-12 extension of the pair-core pattern). */
  def materializeLsh(s: SparkSession, d: String, dir: String,
      shards: Int = 8): Unit =
    Dedup.lshCandidates(s, d).repartition(shards)
      .write.mode("overwrite").parquet(s"$dir/lsh_candidates.parquet")

  /** (da, db) — q28's banded candidate pairs, read from `dir`. */
  def lshCandidates(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/lsh_candidates.parquet")

  /** (cid, cs, cn) — the learned centroid table, read from `dir`. */
  def lloydCentroids(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/lloyd_centroids.parquet")

  /** The two suite-re-paid builder frames LIVE (computed from corpus
    * `d`, not read from a materialized dir) — what Bench times once to
    * decompose its headline into engine cost vs deliberate per-query
    * core re-derivation (the harness-accounting property BASELINE.md's
    * shared-core table documents). The lloyd chain is NOT exposed
    * here: its centroid table is memoized per corpus snapshot, so the
    * suite already pays it once, not per consumer. */
  def liveNearDupPairs(s: SparkSession, d: String): DataFrame =
    Dedup.nearDupPairs(s, d)
  def liveLshCandidates(s: SparkSession, d: String): DataFrame =
    Dedup.lshCandidates(s, d)
}
