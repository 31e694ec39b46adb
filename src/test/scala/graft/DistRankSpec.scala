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
    // the shape that makes it scale: ONE corpus range exchange, reused
    // by both consumers; the local sort survives the optimizer
    val plan = planString(T.distRank(df, Nil, Seq("v", "id")))
    // a ReusedExchange line repeats its referent's description, so
    // count only MATERIALIZED range exchanges
    val nRange = plan.linesIterator.count(l =>
      l.contains("Exchange rangepartitioning") && !l.contains("ReusedExchange"))
    assert(nRange == 1, s"exactly one corpus-scale exchange:\n$plan")
    assert(plan.contains("ReusedExchange"),
      s"offset agg and join must share the range exchange:\n$plan")
    assert(plan.contains("Sort ["),
      s"the record-numbering local sort must survive EliminateSorts:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"the offset frame must broadcast:\n$plan")
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
    // the stamped range exchange is shared by the offset agg and the
    // within-partition window chain — same reuse requirement as
    // distRank, same silent-corruption risk if it ever degrades
    val plan = planString(T.distCumSum(df, Seq("lang"), Seq("id"), "v"))
    val nRange = plan.linesIterator.count(l =>
      l.contains("Exchange rangepartitioning") && !l.contains("ReusedExchange"))
    assert(nRange == 1 && plan.contains("ReusedExchange"),
      s"one materialized range exchange, reused:\n$plan")
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
}
