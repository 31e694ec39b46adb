package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ground truth for [[T.distRank]]/[[T.ntileFromRank]] — the
  * distributed replacement for corpus-partition rank/ntile windows
  * (q79/q96). The rank construction leans on physical-plan behavior
  * (record numbering after a local sort, EliminateSorts stopped by the
  * nondeterministic mid projection), so these specs pin it against the
  * single-partition window result exactly, at a size that spreads over
  * many range partitions.
  */
class DistRankSpec extends SparkSpec {

  private def fixture(n: Int) = {
    import spark.implicits._
    // deterministic scatter with heavy ties in v (forces the doc_id
    // tie-break) spread over every range partition
    spark.range(n).select(
      col("id"),
      pmod(col("id") * 2654435761L, lit(97L)).as("v"),
      concat(lit("l"), pmod(col("id"), lit(3L))).as("lang"))
  }

  test("global distRank equals the single-partition row_number window") {
    val df = fixture(5000)
    val got = T.distRank(df, Nil, Seq("v", "id"))
      .select(col("id"), col("_dr_rank"), col("_dr_cnt"))
    val want = df.withColumn("rn",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select(col("id"), col("rn"))
    val joined = got.join(want, "id")
    assert(joined.filter(col("_dr_rank") =!= col("rn")).isEmpty,
      "distributed ranks must equal the global window's")
    assert(got.filter(col("_dr_cnt") =!= 5000L).isEmpty,
      "_dr_cnt must be the global row count")
    // the shape that makes it scale: the stamped frame is persist()ed,
    // so BOTH consumers (offset agg + join probe) read ONE
    // materialized pid assignment — correctness no longer leans on
    // AQE's exchange-reuse machinery (round-10 ADVICE hardening)
    val run = T.distRank(df, Nil, Seq("v", "id"))
    val plan = executedPlan(run)
    val planStr = plan.toString
    val scans = allPlanNodes(plan).collect {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => s
    }
    assert(scans.size == 2,
      s"both consumers must read the cached stamped frame:\n$planStr")
    assert(scans.forall(_.relation.cacheBuilder eq scans.head.relation.cacheBuilder),
      s"the two scans must share ONE materialized cache:\n$planStr")
    val cached = scans.head.relation.cachedPlan.toString
    assert(cached.contains("Exchange rangepartitioning"),
      s"the cached stamped frame must carry the range exchange:\n$cached")
    assert(cached.contains("Sort ["),
      s"the record-numbering local sort must survive EliminateSorts:\n$cached")
    assert(planStr.contains("BroadcastHashJoin") &&
      !planStr.contains("SortMergeJoin") && !planStr.contains("ShuffledHashJoin"),
      s"the offset frame must broadcast:\n$planStr")
  }

  test("distRank ranks NULL partition keys as a normal group (null-safe offset join)") {
    import spark.implicits._
    // a null lang stripe alongside two real groups — above the fence a
    // null-UNSAFE offset join would silently drop the whole stripe
    val df = spark.range(3000).select(
      col("id"),
      pmod(col("id") * 2654435761L, lit(97L)).as("v"),
      when(pmod(col("id"), lit(3L)) === 0L, lit(null).cast("string"))
        .otherwise(concat(lit("l"), pmod(col("id"), lit(3L)))).as("lang"))
    val got = T.distRank(df, Seq("lang"), Seq("v", "id"))
      .select(col("id"), col("_dr_rank"), col("_dr_cnt"))
    assert(got.count() == 3000L,
      "no row may be dropped by the offset join, including the NULL group")
    val w = Window.partitionBy("lang").orderBy(col("v"), col("id"))
    val want = df.select(col("id"),
      row_number().over(w).cast("long").as("rn"),
      count(lit(1)).over(Window.partitionBy("lang")).as("cnt"))
    assert(got.join(want, "id").filter(col("_dr_rank") =!= col("rn") ||
        col("_dr_cnt") =!= col("cnt")).isEmpty,
      "NULL-group distributed ranks must equal the window's")
    // same guarantee for distCumSum's offset join and fencedLead's
    // rank-shifted self-join (seeded above the cap to engage it)
    val gotPs = T.distCumSum(df, Seq("lang"), Seq("id"), "v")
    assert(gotPs.count() == 3000L)
    val wps = Window.partitionBy("lang").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wantPs = df.select(col("id"),
      (sum(col("v")).over(wps) - col("v")).as("ps"))
    assert(gotPs.join(wantPs, "id").filter(col("_dr_psum") =!= col("ps")).isEmpty,
      "NULL-group distributed prefix sums must equal the window's")
    val dirN = java.nio.file.Files.createTempDirectory("graft-nulllead").toString
    df.write.mode("overwrite").parquet(s"$dirN/documents.parquet")
    T.snapScalar(dirN, "count:documents")(T.WindowRankCap + 1)
    val gotLead = T.fencedLead(spark, dirN, "documents", df,
      Seq("lang"), Seq("v", "id"), "v")
    assert(gotLead.count() == 3000L)
    val wantLead = df.select(col("id"),
      lead(col("v"), 1).over(Window.partitionBy("lang")
        .orderBy(col("v"), col("id"))).as("ld"))
    assert(gotLead.join(wantLead, "id")
        .filter(col("_dr_lead") <=> col("ld") === lit(false)).isEmpty,
      "NULL-group distributed leads must equal the window's")
  }

  test("distRank survives spark.sql.exchange.reuse=false (persist, not reuse, " +
      "carries the pid assignment)") {
    // The round-9 ADVICE scenario: with exchange reuse off, the offset
    // aggregate and the join probe would each re-instantiate the range
    // exchange and sample DIFFERENT boundaries — silent rank
    // corruption under the old reuse-dependent construction. The
    // persist()ed stamped frame makes the ranks exact regardless.
    val saved = spark.conf.get("spark.sql.exchange.reuse", "true")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try {
      val df = fixture(5000)
      val got = T.distRank(df, Seq("lang"), Seq("v", "id"))
        .select(col("id"), col("_dr_rank"), col("_dr_cnt"))
      val w = Window.partitionBy("lang").orderBy(col("v"), col("id"))
      val want = df.select(col("id"),
        row_number().over(w).cast("long").as("rn"),
        count(lit(1)).over(Window.partitionBy("lang")).as("cnt"))
      assert(got.join(want, "id").filter(col("_dr_rank") =!= col("rn") ||
          col("_dr_cnt") =!= col("cnt")).isEmpty,
        "ranks must stay exact with exchange reuse disabled")
    } finally spark.conf.set("spark.sql.exchange.reuse", saved)
  }

  test("intDiv is exact past 2^53 (decimal division, not double)") {
    import spark.implicits._
    val cases = Seq(
      ((1L << 54) + 2L, 2L),             // numerator rounds in a double
      ((1L << 60) + 12345L, 7L),
      (Long.MaxValue, 3L),
      (Long.MaxValue, Long.MaxValue - 1L),
      ((1L << 53) + 1L, 1L),
      (0L, 5L))
    cases.foreach { case (a, b) =>
      val got = spark.range(1)
        .select(T.intDiv(lit(a), lit(b)).as("q")).head.getLong(0)
      assert(got == java.lang.Math.floorDiv(a, b),
        s"intDiv($a, $b) = $got, want ${java.lang.Math.floorDiv(a, b)}")
    }
  }

  test("grouped distRank equals per-group window rank and count") {
    val df = fixture(4000)
    val got = T.distRank(df, Seq("lang"), Seq("v", "id"))
      .select(col("id"), col("_dr_rank"), col("_dr_cnt"))
    val w = Window.partitionBy("lang").orderBy(col("v"), col("id"))
    val want = df.select(col("id"),
      row_number().over(w).cast("long").as("rn"),
      count(lit(1)).over(Window.partitionBy("lang")).as("cnt"))
    val joined = got.join(want, "id")
    assert(joined.filter(col("_dr_rank") =!= col("rn") ||
        col("_dr_cnt") =!= col("cnt")).isEmpty,
      "per-group distributed ranks/counts must equal the window's")
  }

  test("fencedRank: window branch below the cap, distRank branch above, identical values") {
    val df = fixture(3000)
    val dir = java.nio.file.Files.createTempDirectory("graft-rankfence").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // below the cap (real count): plain window, no range exchange
    val below = T.fencedRank(spark, dir, "documents", df, Seq("lang"), Seq("v", "id"))
    assert(!planString(below).contains("Exchange rangepartitioning"),
      "below the cap the rank must be a plain window")
    // seeded above the cap on a byte-identical copy: distRank engages
    val dir2 = java.nio.file.Files.createTempDirectory("graft-rankfence2").toString
    df.write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    T.snapScalar(dir2, "count:documents")(T.WindowRankCap + 1)
    val above = T.fencedRank(spark, dir2, "documents", df, Seq("lang"), Seq("v", "id"))
    assert(planString(above).contains("Exchange rangepartitioning"),
      "above the cap the rank must be the distributed form")
    assert(above.exceptAll(below).isEmpty && below.exceptAll(above).isEmpty,
      "fencedRank branches must be value-identical")
  }

  test("desc distRank equals the descending per-group window (q87's shape)") {
    val df = fixture(3000)
    val got = T.distRank(df, Seq("lang"), Seq("v", "id"), desc = Set("v"))
      .select(col("id"), col("_dr_rank"))
    val w = Window.partitionBy("lang").orderBy(col("v").desc, col("id"))
    val want = df.select(col("id"),
      row_number().over(w).cast("long").as("rn"))
    assert(got.join(want, "id").filter(col("_dr_rank") =!= col("rn")).isEmpty,
      "desc distributed ranks must equal the descending window's")
  }

  test("distCumSum equals the per-group running-sum window; fence flips") {
    val df = fixture(3000)
    val got = T.distCumSum(df, Seq("lang"), Seq("id"), "v")
      .select(col("id"), col("_dr_psum"))
    val w = Window.partitionBy("lang").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.select(col("id"),
      (sum(col("v")).over(w) - col("v")).as("ps"))
    assert(got.join(want, "id").filter(col("_dr_psum") =!= col("ps")).isEmpty,
      "distributed exclusive prefix sums must equal the window's")
    // the stamped frame is persist()ed and shared by the offset agg
    // and the within-partition window chain — one materialized pid
    // assignment by construction (same discipline as distRank)
    val plan = executedPlan(T.distCumSum(df, Seq("lang"), Seq("id"), "v"))
    val scans = allPlanNodes(plan).collect {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => s
    }
    assert(scans.size == 2 &&
      scans.forall(_.relation.cacheBuilder eq scans.head.relation.cacheBuilder),
      s"both consumers must read ONE cached stamped frame:\n$plan")
    // fence: window below the cap, distributed form above, same values
    val dir = java.nio.file.Files.createTempDirectory("graft-csfence").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val below = T.fencedCumSum(spark, dir, "documents", df, Seq("lang"), Seq("id"), "v")
    assert(!planString(below).contains("Exchange rangepartitioning"),
      "below the cap the cumsum must be a plain window")
    val dir2 = java.nio.file.Files.createTempDirectory("graft-csfence2").toString
    df.write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    T.snapScalar(dir2, "count:documents")(T.WindowRankCap + 1)
    val above = T.fencedCumSum(spark, dir2, "documents", df, Seq("lang"), Seq("id"), "v")
    assert(planString(above).contains("Exchange rangepartitioning"),
      "above the cap the cumsum must be the distributed form")
    assert(above.exceptAll(below).isEmpty && below.exceptAll(above).isEmpty,
      "fencedCumSum branches must be value-identical")
  }

  test("fencedLead: lead window below the cap, rank-shifted self-join above, identical values") {
    val df = fixture(3000)
    val dir = java.nio.file.Files.createTempDirectory("graft-leadfence").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val below = T.fencedLead(spark, dir, "documents", df,
      Seq("lang"), Seq("v", "id"), "v")
    assert(!planString(below).contains("Exchange rangepartitioning"),
      "below the cap the lead must be a plain window")
    val w = Window.partitionBy("lang").orderBy(col("v"), col("id"))
    val want = df.select(col("id"), lead(col("v"), 1).over(w).as("ld"))
    assert(below.join(want, "id")
        .filter(col("_dr_lead") <=> col("ld") === lit(false)).isEmpty,
      "window-branch lead must equal the reference window")
    val dir2 = java.nio.file.Files.createTempDirectory("graft-leadfence2").toString
    df.write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    T.snapScalar(dir2, "count:documents")(T.WindowRankCap + 1)
    val above = T.fencedLead(spark, dir2, "documents", df,
      Seq("lang"), Seq("v", "id"), "v")
    assert(planString(above).contains("Exchange rangepartitioning"),
      "above the cap the lead must be the distributed form")
    assert(above.join(want, "id")
        .filter(col("_dr_lead") <=> col("ld") === lit(false)).isEmpty,
      "distributed lead must equal the reference window (incl. NULL group ends)")
  }

  test("ntileFromRank is bit-identical to SQL NTILE at every remainder") {
    import spark.implicits._
    for (n <- Seq(1, 2, 3, 4, 5, 6, 7, 100, 101); k <- Seq(3, 4)) {
      val df = spark.range(n).select(col("id"))
      val viaWindow = df.withColumn("t",
          ntile(k).over(Window.orderBy("id")).cast("long"))
        .select(col("id"), col("t"))
      val viaFormula = df.select(col("id"),
        T.ntileFromRank(k, col("id") + 1L, lit(n.toLong)).as("t"))
      assert(viaWindow.exceptAll(viaFormula).isEmpty &&
        viaFormula.exceptAll(viaWindow).isEmpty,
        s"ntileFromRank diverged from ntile($k) at n=$n")
    }
  }

  test("non-total sortCols: local sort keys append remaining orderable columns, " +
      "skip non-orderable ones, and ranks stay a legal tie-permutation") {
    // heavy ties in the single sort key + a payload column that breaks
    // them + a MAP column (not orderable — must be skipped, not crash):
    // the recompute-determinism fix (round-11 ADVICE) sorts the stamped
    // frame by every orderable column, so a lost persisted block
    // re-derives the identical record numbering for ANY caller
    val df = fixture(3000)
      .withColumn("tie", pmod(col("v"), lit(5L)))
      .withColumn("m", map(lit("k"), col("id"))) // MapType: unorderable
    val got = T.distRank(df, Seq("lang"), Seq("tie"))
    // ranks within each (lang) group must be exactly 1..n — a legal
    // assignment among ties, no gaps, no duplicates
    val bad = got.groupBy("lang")
      .agg(count(lit(1)).as("n"), countDistinct(col("_dr_rank")).as("d"),
        min(col("_dr_rank")).as("lo"), max(col("_dr_rank")).as("hi"))
      .filter(col("n") =!= col("d") || col("lo") =!= 1L || col("hi") =!= col("n"))
    assert(bad.isEmpty, "ranks must be a gap-free permutation per group")
    // tie blocks must occupy contiguous rank ranges: every row's rank
    // sits within [#{smaller ties}+1, #{smaller-or-equal ties}] —
    // true for ANY legal tie assignment, violated if the local sort
    // mixed tie groups
    val bounds = df.groupBy("lang", "tie").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy("lang").orderBy("tie")))
    val viol = got.join(bounds, Seq("lang", "tie"))
      .filter(col("_dr_rank") > col("cum") ||
        col("_dr_rank") <= col("cum") - col("cnt"))
    assert(viol.isEmpty, "tie blocks must occupy contiguous rank ranges")
  }

  test("unpersistRanks is safe at any point: release before consumption, values intact") {
    // the docstring contract: releasing the stamped-frame cache is
    // safe mid-flight — an in-flight consumer just recomputes from the
    // deterministic shuffle output (the round-11 localSortKeys
    // guarantee) — and a drained registry is a no-op
    val df = fixture(2000)
    val ranked = T.distRank(df, Nil, Seq("v", "id"))
    T.unpersistRanks() // BEFORE the consuming action: recompute path
    val want = df.withColumn("rn",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select(col("id"), col("rn"))
    val got = ranked.select(col("id"), col("_dr_rank"))
    assert(got.join(want, "id").filter(col("_dr_rank") =!= col("rn")).isEmpty,
      "ranks must survive an early cache release")
    T.unpersistRanks() // drained registry: no-op
  }
}
