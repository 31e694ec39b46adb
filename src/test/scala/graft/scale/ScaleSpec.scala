package graft.scale

import graft.SparkSpec
import graft.T
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Plan-level proofs for the scale utilities: salting preserves join
  * semantics; bucketing removes the join shuffle entirely. */
class ScaleSpec extends SparkSpec {

  private def countShuffles(plan: SparkPlan): Int = {
    val normalized = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    normalized.collect { case _: ShuffleExchangeExec => 1 }.sum
  }

  test("saltedJoin returns exactly the rows of the plain join") {
    val orders = T.tbl(spark, sfDir, "orders")
    val customer = T.tbl(spark, sfDir, "customer")
    val plain = orders.join(customer,
        orders("o_custkey") === customer("c_custkey"))
      .select("o_orderkey", "c_name")
    val salted = Scale.saltedJoin(orders, customer, "o_custkey", "c_custkey", 8)
      .select("o_orderkey", "c_name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = T.tbl(spark, sfDir, "orders")
      val customer = T.tbl(spark, sfDir, "customer")
      Scale.writeBucketed(orders, "orders_b", 4, Seq("o_custkey"))
      Scale.writeBucketed(customer, "customer_b", 4, Seq("c_custkey"))
      val ob = spark.table("orders_b")
      val cb = spark.table("customer_b")

      val unbucketed = orders.join(customer,
        orders("o_custkey") === customer("c_custkey"))
      val bucketed = ob.join(cb, ob("o_custkey") === cb("c_custkey"))
      bucketed.count() // materialize (resolves AQE final plan)
      unbucketed.count()

      assert(countShuffles(unbucketed.queryExecution.executedPlan) >= 2,
        "plain sort-merge join should shuffle both sides")
      assert(countShuffles(bucketed.queryExecution.executedPlan) == 0,
        "bucketed join must be shuffle-free")
      assert(bucketed.count() == unbucketed.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("date-partitioned write prunes partitions on a date filter") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files.createTempDirectory("events_by_day").toString
    try {
      val events = T.tbl(spark, sfDir, "events")
      Scale.writeDatePartitioned(events, dir, "ts")
      val part = spark.read.parquet(dir)

      def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
        df.queryExecution.executedPlan
          .collect { case f: FileSourceScanExec => f }.head

      val total = scanOf(part.select("event_id")).selectedPartitions.partitionCount
      assert(total > 1, s"expected one partition per day, got $total")

      val filtered = part.filter(col("p_date") === lit("2024-01-05"))
      val scan = scanOf(filtered)
      // The filter must reach the listing as a PartitionFilter (pruned
      // before I/O), not survive as a post-scan data filter.
      assert(scan.partitionFilters.exists(_.references.exists(_.name == "p_date")),
        s"p_date filter must be a partition filter:\n${scan.partitionFilters}")
      assert(scan.selectedPartitions.partitionCount == 1,
        s"one day => one pruned partition, got ${scan.selectedPartitions.partitionCount} of $total")
      // Semantics unchanged vs filtering the unpartitioned table.
      val expected = events.filter(to_date(col("ts")) === lit("2024-01-05")).count()
      assert(filtered.count() == expected && expected > 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("keySkewProfile surfaces the hottest keys first") {
    val prof = Scale.keySkewProfile(
      T.tbl(spark, sfDir, "events"), col("event_type"), topN = 3).collect()
    assert(prof.length == 3)
    assert(prof.map(_.getLong(1)).toSeq == prof.map(_.getLong(1)).sorted.reverse.toSeq)
  }
}
