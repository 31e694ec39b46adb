package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities: the shuffle-shaping tools a 100 TB deployment of
  * this engine leans on. Everything here is plan surgery, not new
  * semantics — results are identical to the naive operator, verified
  * by tests against it.
  */
object Scale {

  /** Salted equi-join for skewed keys: replicates each right-side row
    * `salt` times and scatters left-side rows across the replicas, so
    * one hot key spreads over `salt` reducers instead of melting one.
    * Use when AQE's runtime skew split isn't available (e.g. a
    * deliberately partitioned stage) or the skew is known up front.
    *
    * Semantics = `left.join(right, leftKey === rightKey, "inner")`,
    * exactly: the salt column is internal and dropped.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      salt: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salt)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLeft.join(saltedRight,
      saltedLeft(leftKey) === saltedRight(rightKey) &&
        saltedLeft("__salt") === saltedRight("__salt"))
      .drop("__salt")
  }

  /** Writes a frame as a bucketed+sorted table so future equi-joins
    * and aggregations on `keys` are shuffle-free (both sides already
    * hash-partitioned by bucket id). This is the co-location strategy
    * for repeated joins over the same key at scale — pay one shuffle
    * at write time, none per query. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      buckets: Int,
      keys: Seq[String]): Unit =
    df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Writes a frame date-partitioned (Hive directory layout, one
    * directory per day of `tsCol`) — the #1 pruning lever at 100 TB:
    * a query filtering on `p_date` reads ONLY the matching partition
    * directories (the scan's PartitionFilters prune at file-listing
    * time, before any I/O), so a one-day query over a 3-year corpus
    * touches ~0.1% of the files. Pruning is asserted against the
    * physical scan in ScaleSpec. */
  def writeDatePartitioned(df: DataFrame, path: String, tsCol: String): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write.partitionBy("p_date").mode("overwrite").parquet(path)

  /** Connected components with POINTER JUMPING — the O(log diameter)
    * replacement for plain min-label propagation (q48's loop, which is
    * O(diameter) rounds and fine for shallow near-dup cliques but not
    * for chain-shaped graphs at scale). Each round does two joins:
    * neighbor-min propagation, then the shortcut label(u) ←
    * label(label(u)) (path halving), so a 10⁶-long chain converges in
    * ~20 rounds instead of 10⁶ iterations. Labels are component
    * minima, matching q48's convention. Throws if convergence is not
    * CONFIRMED within maxRounds — the last round must observe zero
    * changes, so a graph needing k productive rounds needs
    * maxRounds ≥ k+1; silent wrong answers are worse than a loud
    * bound. Input: (src, dst) edge frame, either direction. */
  def connectedComponents(edges: DataFrame, maxRounds: Int = 30): DataFrame = {
    // Materialized ONCE: the caller's edge plan may be arbitrarily
    // expensive (q48's escape-hatch use feeds the near-dup join here)
    // and must not re-execute every round.
    val und = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var labels = und.groupBy(col("src").as("node"))
      .agg(min(col("dst")).as("nmin"))
      .select(col("node"), least(col("node"), col("nmin")).as("label"))
      .localCheckpoint()
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      val emin = und.join(labels, und("dst") === labels("node"))
        .groupBy(und("src").as("pn")).agg(min(col("label")).as("emin"))
      // Checkpoint BEFORE the jump self-join: both sides of that join
      // read `propagated`, which would otherwise execute its join
      // twice (ReuseExchange dedupes shuffles, not the operators
      // above them) — and before the count, same discipline as q48.
      val propagated = labels
        .join(emin, labels("node") === emin("pn"), "left")
        .select(col("node"), col("label").as("prevLabel"),
          least(col("label"), coalesce(col("emin"), col("label"))).as("label"))
        .localCheckpoint()
      val lu = propagated.select(col("node").as("jn"), col("label").as("jl"))
      val jumped = propagated
        .join(lu, propagated("label") === lu("jn"), "left")
        .select(col("node"), col("prevLabel"),
          coalesce(col("jl"), col("label")).as("label"))
        .localCheckpoint()
      changed = jumped.filter(col("label") =!= col("prevLabel")).count()
      labels = jumped.select("node", "label")
      round += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxRounds rounds")
    labels
  }

  /** Root resolution over a FUNCTIONAL FOREST — every node has exactly
    * ONE parent edge and the parent relation is acyclic (the caller's
    * contract; e.g. the SemDeDup keeper chain, where keeper < dropped
    * id always, so no cycle can exist). Returns (node, root): the
    * terminal of each node's parent chain — for the keeper forest,
    * the RETAINED representative every tree hangs from.
    *
    * This is the directed sibling of [[connectedComponents]]: when
    * edges are functional there is no need for the undirected
    * neighbor-min propagation (each node's answer is fully determined
    * by following pointers), so each round is ONE self-join doing the
    * path-halving shortcut root(u) ← root(root(u)) — a depth-D forest
    * converges in ⌈log₂ D⌉+1 rounds over O(|edges|) rows throughout.
    * Convergence must be OBSERVED (a zero-change round) within
    * maxRounds or this throws — a cycle (contract violation) would
    * otherwise converge silently to an arbitrary in-cycle label.
    * Input: (node, parent) edge frame. Nodes may appear as parents of
    * other nodes; only `node`s get an output row. */
  def functionalRoots(edges: DataFrame, maxRounds: Int = 30): DataFrame = {
    // Materialized once: the caller's edge plan may be expensive (the
    // q113 drop frame rides the SemDeDup pair join) and each round —
    // plus the change count — would otherwise re-execute it.
    var roots = edges.select(col("node"), col("parent").as("root"))
      .localCheckpoint()
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      val lu = roots.select(col("node").as("jn"), col("root").as("jr"))
      // Checkpoint before the count: the filter and the next round
      // both read `jumped` (same discipline as connectedComponents).
      val jumped = roots.join(lu, roots("root") === lu("jn"), "left")
        .select(col("node"), col("root").as("prev"),
          coalesce(col("jr"), col("root")).as("root"))
        .localCheckpoint()
      changed = jumped.filter(col("root") =!= col("prev")).count()
      roots = jumped.select("node", "root")
      round += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"functionalRoots did not converge in $maxRounds rounds " +
          "(cycle in the parent relation?)")
    roots
  }

  /** Rough per-key frequency profile — the diagnostic that decides
    * between broadcast / salt / AQE-skew-join for a key column. */
  def keySkewProfile(df: DataFrame, key: Column, topN: Int = 10): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key"))
      .limit(topN)
}
