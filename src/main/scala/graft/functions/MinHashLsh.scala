package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared MinHash+LSH signature scheme — the ONE definition used by both
  * the batch candidate-pair query (q28, `queries/Dedup.scala`) and the
  * online streaming dedup (s11, `streaming/StreamingDedup.scala`), so
  * batch and stream provably agree on which pairs are candidates.
  *
  * Scheme: 3-gram token shingles → portable md5-prefix hash →
  * 16 minhashes mh_i = min((h·(2i+1) + 7919·i + 13) mod 4294967311)
  * → NumHashes/rowsPerBand bands (default 4×4; batch q28 derives
  * rowsPerBand from the corpus count), each band signature the
  * '-'-joined minhash values. Pure integer arithmetic on the portable
  * hash ⇒ bit-identical in the DuckDB oracle.
  *
  * Scale design (100 TB posture): the whole signature computation is
  * row-local — nested higher-order functions over the per-document
  * shingle array, no explode, no shuffle, no stateful aggregation.
  * (An earlier formulation exploded 16× per hashed shingle and shuffled
  * into groupBy(doc_id, i).min — same result, but the explode+shuffle
  * was 25% of the whole benchmark and would move 16× the corpus over
  * the network at scale. Signatures are embarrassingly parallel; only
  * candidate generation should shuffle, and it shuffles by (band, sig).)
  */
object MinHashLsh {

  /** Minhash modulus (smallest prime > 2^32). */
  val P = 4294967311L

  val NumHashes = 16
  val Bands = 4
  val RowsPerBand: Int = NumHashes / Bands

  /** Per-row md5-prefix hash of each array element ([[graft.T.phash]]
    * — the single portable-hash definition — lifted into a lambda). */
  def hashAll(shingles: Column): Column =
    transform(shingles, x => graft.T.phash(x))

  /** Distinct 3-gram shingle array of a pre-split token array column. */
  def shingleArray(t: Column): Column =
    array_distinct(transform(
      sequence(lit(1), size(t) - 2),
      i => concat_ws(" ",
        element_at(t, i),
        element_at(t, i + 1),
        element_at(t, i + 2))))

  /** The 16-minhash fold over a hashed-shingle array — the ONE
    * definition of the minhash recurrence, shared by
    * [[bandSignatures]] (which slices the accumulator into band
    * strings in its FINISH lambda) and [[minhashArray]] (which
    * returns it raw for signature-agreement estimation, q88). */
  private def mhFold(hashes: Column, finish: Column => Column): Column =
    aggregate(
      hashes,
      array_repeat(lit(P), NumHashes),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(NumHashes - 1)),
        (a, i) => least(a,
          (h * (lit(2L) * i + 1L) + lit(7919L) * i + 13L) % P)),
      finish)

  /** (doc_id, text) → (doc_id, mh: array<bigint>) — the raw 16-minhash
    * vector per document (same row-local, shuffle-free contract as
    * [[bandSignatures]]; <3-token docs are skipped identically). */
  def minhashArray(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"),
        mhFold(hashAll(shingleArray(col("t"))), acc => acc).as("mh"))

  /** (doc_id, text) → (doc_id, band, sig) rows, one per band, all
    * computed row-locally (docs with fewer than 3 tokens have no
    * shingles and are skipped, matching the batch shingle builder).
    *
    * `rowsPerBand` (must divide [[NumHashes]]) sets the band
    * structure: NumHashes/rowsPerBand bands of rowsPerBand minhashes.
    * More rows per band = stricter candidates = smaller LSH buckets —
    * batch q28 DERIVES it from the corpus count (fixed-width bands
    * make Σ bucket² candidate cost quadratic in the corpus), while
    * streaming keeps the default: an unbounded stream has no corpus
    * count, and its keyed dedup state depends on a stable scheme. It
    * is a Column so the scalar can arrive via a broadcast cross-join
    * (no driver-side count action).
    *
    * Parallelism contract: this builder adds NO exchange (the
    * streaming dedup path must stay shuffle-free ahead of its keyed
    * state). The signature compute is CPU-bound per row, so BATCH
    * callers whose input is a single small parquet split must add
    * their own `repartition` before calling (q28/q55 do), or the
    * whole build serializes on one core; at real scale the scan has
    * many splits and no repartition is needed. */
  def bandSignatures(docs: DataFrame,
      rowsPerBand: Column = lit(RowsPerBand)): DataFrame =
    // The whole signature — md5 per shingle, 16-minhash fold, band
    // strings — is ONE expression, so nothing is ever re-evaluated:
    // the md5s are the aggregate's input (evaluated once), the 16
    // minhashes accumulate in one pass over it (init P > every mod
    // value; ≥1 shingle guaranteed by the size filter), and the band
    // strings come from the aggregate's FINISH lambda, which runs
    // once on the final accumulator. (Formulations that alias the
    // minhash array in a separate projection get inlined by
    // CollapseProject into the band lambda and recompute the fold —
    // and with it the md5 input — once per band.) No shuffle: batch
    // call sites that read a single small parquet split add their own
    // repartition for parallelism; the streaming path stays
    // exchange-free ahead of its keyed state.
    docs
      .select(col("doc_id"), split(col("text"), " ").as("t"),
        rowsPerBand.cast("int").as("__r"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"),
        posexplode(mhFold(
          hashAll(shingleArray(col("t"))),
          acc => transform(
            sequence(lit(0), (lit(NumHashes) / col("__r")).cast("int") - 1),
            b => concat_ws("-", transform(
              slice(acc, b * col("__r") + 1, col("__r")),
              x => x.cast("string"))))))
          .as(Seq("band", "sig")))
}
