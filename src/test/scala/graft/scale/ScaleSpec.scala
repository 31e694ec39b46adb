package graft.scale

import graft.SparkSpec
import graft.T
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Plan-level proofs for the scale utilities: salting preserves join
  * semantics; bucketing removes the join shuffle entirely. */
class ScaleSpec extends SparkSpec {

  private def countShuffles(df: DataFrame): Int =
    allPlanNodes(executedPlan(df))
      .count(_.isInstanceOf[ShuffleExchangeExec])

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

      assert(countShuffles(unbucketed) >= 2,
        "plain sort-merge join should shuffle both sides")
      assert(countShuffles(bucketed) == 0,
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

  test("ShardWriter layout prunes to one partition on a source filter") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files.createTempDirectory("shardw").toString + "/corpus"
    val docs = T.tbl(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    graft.sinks.ShardWriter.publish(docs, dir, "source", 50L)
    val part = spark.read.parquet(dir)
    def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
      df.queryExecution.executedPlan
        .collect { case f: FileSourceScanExec => f }.head
    val filtered = part.filter(col("source") === "src1")
    val scan = scanOf(filtered)
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "source")),
      s"source filter must prune at listing time:\n${scan.partitionFilters}")
    assert(scan.selectedPartitions.partitionCount == 1,
      s"one source => one partition, got ${scan.selectedPartitions.partitionCount}")
    assert(filtered.count() ==
      docs.filter(col("source") === "src1").count())
  }

  test("AQE splits a skewed join at runtime (the third skew lever)") {
    import spark.implicits._
    // One key holds ~100k rows, the rest hold 1 — the shape that melts
    // a single reducer without mitigation. Thresholds are lowered so
    // the test's 100k-row partition counts as "skewed" at test scale.
    val conf = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "100KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(100000)
        .select(when(col("id") < 95000, lit(0L)).otherwise(col("id")).as("k"),
          col("id").as("payload"))
      val right = spark.range(5000).select(col("id").as("k2"), col("id").as("r"))
      val plan = planString(left.join(right, col("k") === col("k2")))
      assert(plan.contains("skew="),
        s"AQE should mark the join skewed and split the hot partition:\n$plan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("pointer-jumping CC: logarithmic rounds on a chain, exact on random graphs") {
    import spark.implicits._
    // A 200-node chain has diameter 199: plain min-label propagation
    // needs ~199 iterations; pointer jumping must finish in ≤ 12
    // rounds (2^12 ≫ 199 with path halving) or the bound throws.
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("src", "dst")
    val chainLabels = Scale.connectedComponents(chain, maxRounds = 12)
      .as[(Long, Long)].collect().toMap
    assert(chainLabels.size == 200 && chainLabels.values.forall(_ == 0L))

    // Random multi-component graph vs a driver-side union-find oracle.
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    val got = Scale.connectedComponents(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val expected = nodes.map(n => n -> find(n)).toMap
    // union-find roots are component minima here because larger roots
    // always point at smaller ones
    assert(got == expected, s"CC mismatch: ${got.toSet.diff(expected.toSet)}")
  }

  test("T.spread: spreads a single-split scan, is the IDENTITY on a well-split input") {
    import org.apache.spark.sql.functions.col
    // Narrow input (1 partition < local[4] parallelism): spread must
    // insert the parallelizing exchange.
    val narrow = spark.range(0, 1000, 1, numPartitions = 1).toDF("id")
    val spreadNarrow = T.spread(narrow, col("id"))
    assert(countShuffles(spreadNarrow) == 1,
      "a single-split input below parallelism must be repartitioned")
    // Well-split input (8 partitions >= parallelism 4) — the
    // real-scale case: spread must add NO exchange at all (the
    // round-3 verdict's 'unconditional corpus shuffle' is gone).
    val wide = spark.range(0, 1000, 1, numPartitions = 8).toDF("id")
    val spreadWide = T.spread(wide, col("id"))
    assert(spreadWide eq wide, "spread must be the identity frame when " +
      "the scan already has >= parallelism partitions")
    assert(countShuffles(spreadWide) == 0)
  }

  test("spill discipline: the pair core completes memory-starved by spilling, not OOM") {
    // A fresh JVM (SparkSpec's session pins this JVM's heap and
    // memory manager, so starvation must be a subprocess): 512 MB
    // heap, spark.memory.fraction=0.2 (~64 MB execution+storage), and
    // force-spill thresholds low enough that every shuffle write,
    // sort, and window in q25's capped-shingle df-window/pair-join/
    // aggregate chain exercises its EXTERNAL (spillable)
    // implementation — the same machinery the sf10 rehearsal measured
    // spilling 29 GB safely (BASELINE round-12). Done = exit 0
    // (spill, not OOM) with nonzero spilled bytes in task metrics.
    // (This probe ran q52 until round 12; the topk_assign kernel
    // rewrite removed q52's window sorts entirely — row-local
    // assignment needs no execution memory — so q52 no longer spills
    // even starved, and the pair core is the right subject.)
    val addOpens = Seq("java.lang", "java.lang.invoke", "java.lang.reflect",
      "java.io", "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
      "sun.security.action", "sun.util.calendar")
      .map(p => s"--add-opens=java.base/$p=ALL-UNNAMED")
    val cmd = Seq("java") ++ addOpens ++ Seq(
      "-Xmx640m",
      "-Dspark.memory.fraction=0.3",
      // force thresholds sized to a few spills per task, not hundreds:
      // each spill file's READBACK allocates a buffer, so a tiny
      // threshold (the old 200) OOMs on reader buffers at q25's
      // shingle volume — the exact opposite of what the probe proves
      "-Dspark.shuffle.spill.numElementsForceSpillThreshold=20000",
      "-Dspark.sql.windowExec.buffer.spill.threshold=20000",
      "-Dspark.ui.enabled=false",
      "-cp", "target/scala-2.13/classes:/opt/spark/jars/*",
      "graft.scale.SpillProbe", "q25_minhash_textdedup",
      "/root/testdata/sf0.01")
    val out = new StringBuilder
    val logger = scala.sys.process.ProcessLogger(
      l => out.synchronized { out.append(l).append('\n') },
      l => out.synchronized { out.append(l).append('\n') })
    val code = scala.sys.process.Process(cmd).!(logger)
    val text = out.toString
    assert(code == 0, s"SpillProbe must complete (no OOM), exit=$code:\n" +
      text.linesIterator.toSeq.takeRight(30).mkString("\n"))
    val spilled = "spilled=(\\d+)".r.findFirstMatchIn(text).map(_.group(1).toLong)
    assert(spilled.exists(_ > 0),
      s"expected nonzero spill under starvation, got $spilled")
  }

  test("keySkewProfile surfaces the hottest keys first") {
    val prof = Scale.keySkewProfile(
      T.tbl(spark, sfDir, "events"), col("event_type"), topN = 3).collect()
    assert(prof.length == 3)
    assert(prof.map(_.getLong(1)).toSeq == prof.map(_.getLong(1)).sorted.reverse.toSeq)
  }

  test("functionalRoots: logarithmic rounds on a deep chain, exact on a random forest") {
    import spark.implicits._
    // A 300-deep parent chain: one-hop-per-round resolution would need
    // 300 iterations; path halving must observe convergence within 11
    // rounds (⌈log₂ 300⌉ = 9 productive + slack) or throw.
    val chain = (1L to 300L).map(i => (i, i - 1)).toDF("node", "parent")
    val got = Scale.functionalRoots(chain, maxRounds = 11)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 300 && got.values.forall(_ == 0L),
      s"every chain node must resolve to root 0: ${got.filter(_._2 != 0L).take(3)}")

    // Random functional forest (parent < node, the keeper-chain
    // contract) vs a driver-side walk.
    val rnd = new scala.util.Random(13)
    val edges = (1L until 500L).filter(_ => rnd.nextBoolean())
      .map(n => (n, rnd.nextLong(n).max(0L)))
    val parentOf = edges.toMap
    def walk(n: Long): Long =
      parentOf.get(n).map(walk).getOrElse(n)
    val roots = Scale.functionalRoots(edges.toDF("node", "parent"))
      .as[(Long, Long)].collect().toMap
    assert(roots.keySet == edges.map(_._1).toSet,
      "one output row per input node, exactly")
    val bad = edges.map(_._1).filter(n => roots(n) != walk(parentOf(n)))
    assert(bad.isEmpty, s"roots disagree with the driver walk at: ${bad.take(5)}")
  }
}
