package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The long-n-gram (8-token) exact-match hash scheme — ONE definition
  * shared by the batch contamination operators (q84/q91,
  * `queries/Curation.scala`) and the streaming gate (s17,
  * `streaming/StreamingDecontaminate.scala`), so batch and stream
  * provably agree on which grams match.
  *
  * Gram hash = Horner fold (mod 2^31-1, base 1000003) over the 8
  * PER-TOKEN portable hashes (graft.T.phash): each token is md5'd
  * once, not once per gram it appears in — measured 6.8× faster than
  * per-gram md5s over concatenated strings at sf0.1. Pure integer
  * arithmetic, bit-identical in the DuckDB oracles (the Horner twin is
  * `Curation.gram8HornerSql`).
  *
  * TWO-STEP API on purpose: [[tokenHashes]] must be aliased in its own
  * projection and [[gram8FromTokenHashes]] applied to that alias in a
  * second select. Referencing the token-hash array from BOTH size()
  * and the per-gram lambda keeps CollapseProject from inlining it into
  * the lambda — inlined, the md5 pass would re-run once per gram
  * instead of once per document (the 6.8× q84 regression). Same
  * discipline as MinHashLsh's single-expression fold.
  *
  * Scale posture: entirely row-local — no shuffle, safe ahead of
  * streaming keyed state.
  */
object GramHash {

  val GramLen = 8
  val Base = 1000003L
  /** 2^31 − 1; keeps the Horner accumulator × base within a BIGINT. */
  val Mod = 2147483647L

  /** Per-token portable hashes of a pre-split token array. Alias this
    * in its own select (see the two-step note above). */
  def tokenHashes(t: Column): Column = transform(t, tok => graft.T.phash(tok))

  /** Distinct 8-gram Horner hashes (array<bigint>; empty when the doc
    * has fewer than [[GramLen]] tokens — guarded explicitly, because
    * Spark's sequence(1, n) runs DESCENDING for n < 1 rather than
    * yielding an empty array) over an ALIASED [[tokenHashes]] column. */
  def gram8FromTokenHashes(hh: Column): Column =
    when(size(hh) >= GramLen,
      array_distinct(transform(
        sequence(lit(1), size(hh) - (GramLen - 1)),
        i => aggregate(
          slice(hh, i, lit(GramLen)),
          lit(0L),
          (acc, h) => (acc * Base + h) % Mod))))
      .otherwise(array().cast("array<bigint>"))
}
