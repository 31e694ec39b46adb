package graft.streaming

import java.nio.file.{Files, Path}

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** s23: the streaming semantic-dedup gate is BATCHING-INVARIANT —
  * streaming a vector shard through the gate in three micro-batches
  * produces exactly the verdicts of one batch gate() call over the
  * whole shard, because every verdict is a pure function of (vector,
  * static index). Also pins: exact copies of indexed vectors MUST
  * drop (their twin sits in their assigned cluster at cosine 1.0 ≥
  * the shared threshold), every keeper is an indexed vec_id (the
  * index-only form has no transitive-chain caveat), degenerate
  * vectors are excluded by the shared admission rule, and replays
  * land exactly-once.
  */
class StreamingSemDedupSpec extends SparkSpec {

  private def tmp(p: String): Path = Files.createTempDirectory(p)

  test("three-batch streamed verdicts equal the one-shot batch gate") {
    val idx = StreamingSemDedup.buildIndex(spark, sfDir)
    try {
      val indexed = graft.T.tbl(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding")).orderBy("vec_id")
        .limit(24).collect()
      assert(indexed.nonEmpty)

      // incoming shard: 24 exact copies of indexed vectors under fresh
      // ids (guaranteed drops: the twin shares their cluster at cosine
      // 1.0), one zero vector and one NaN vector (admission must
      // exclude both — no verdict row)
      val copies = indexed.map { r =>
        val emb = r.getSeq[Float](1).map(_.toString).mkString(",")
        s"""{"vec_id": ${r.getLong(0) + 900000L}, "embedding": [$emb]}"""
      }
      val dim = indexed.head.getSeq[Float](1).length
      val zeroJson = s"""{"vec_id": 999998, "embedding": [${
        Seq.fill(dim)("0.0").mkString(",")}]}"""
      val nanJson = s"""{"vec_id": 999999, "embedding": [${
        ("NaN" +: Seq.fill(dim - 1)("0.5")).mkString(",")}]}"""
      val lines = (copies :+ zeroJson :+ nanJson).toSeq

      val dir = tmp("semdedup").resolve("landing")
      Files.createDirectories(dir)
      lines.grouped((lines.length + 2) / 3).zipWithIndex.foreach {
        case (chunk, i) =>
          Files.write(dir.resolve(s"shard$i.jsonl"), chunk.asJava)
      }
      val schema = new StructType()
        .add("vec_id", LongType).add("embedding", ArrayType(FloatType))
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(dir.toString)
      val batchIn = spark.read.schema(schema).json(dir.toString)

      // the gate must consume the CACHED, cluster-partitioned member
      // frame — without the persist every micro-batch re-assigns the
      // whole corpus
      val gatePlan = planString(StreamingSemDedup.gate(batchIn, idx))
      assert(gatePlan.contains("InMemoryTableScan") ||
        gatePlan.contains("TableCacheQueryStage"),
        s"the index side of the gate join must hit the cache:\n$gatePlan")

      val outDir = tmp("semdedup-out").toString + "/verdicts"
      val q = StreamingSemDedup.start(stream, idx, outDir,
        tmp("semdedup-ckpt").toString)
      q.awaitTermination(180000)

      def asSet(df: org.apache.spark.sql.DataFrame) =
        df.select("vec_id", "kept", "keeper").collect()
          .map(r => (r.getLong(0), r.getBoolean(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
      val streamed = asSet(spark.read.parquet(outDir))
      val oneShot = asSet(StreamingSemDedup.gate(batchIn, idx))
      assert(streamed == oneShot,
        s"batching must not change verdicts: extra=${streamed.diff(oneShot)} " +
          s"missing=${oneShot.diff(streamed)}")

      // exactly one verdict per ADMISSIBLE vector: the zero and NaN
      // rows are excluded by the shared admission rule, copies all land
      assert(streamed.map(_._1) == copies.indices
        .map(i => indexed(i).getLong(0) + 900000L).toSet,
        s"admissible set wrong: ${streamed.map(_._1)}")
      // every exact copy must DROP, and every keeper is an indexed id
      assert(streamed.forall(v => !v._2 && v._3.isDefined),
        s"exact copies must all drop: ${streamed.filter(_._2)}")
      val indexIds = graft.T.tbl(spark, sfDir, "embeddings")
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(streamed.flatMap(_._3).subsetOf(indexIds),
        "keeper must always be an indexed vec_id")

      // replay with a fresh checkpoint against the same outDir: the
      // idempotent partition overwrite must not duplicate verdicts
      val q2 = StreamingSemDedup.start(stream, idx, outDir,
        tmp("semdedup-ckpt2").toString)
      q2.awaitTermination(180000)
      assert(spark.read.parquet(outDir).count() == streamed.size.toLong,
        "replay must replace batch partitions, not append")
    } finally idx.release()
  }

  test("verdicts agree with the exhaustive whole-index ground truth") {
    val idx = StreamingSemDedup.buildIndex(spark, sfDir)
    try {
      import spark.implicits._
      // a sign-alternating probe plus one exact corpus copy: the gate
      // tests only the ASSIGNED cluster, so validate each verdict
      // against the exhaustive max-cosine over the WHOLE index — a
      // global max below threshold forces keep (cluster-local can only
      // see less), and a drop's keeper must really score ≥ threshold
      val corpus = graft.T.tbl(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding")).orderBy("vec_id")
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
      val dim = corpus.head._2.length
      def cos6(a: Seq[Float], b: Seq[Float]): Double = {
        def dot(x: Seq[Float], y: Seq[Float]) =
          x.iterator.zip(y.iterator).map { case (p, q) =>
            p.toDouble * q.toDouble }.sum
        val d = math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))
        if (d > 0) BigDecimal(dot(a, b) / d)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        else -1.0
      }
      val probe = (0 until dim).map(i =>
        if (i % 2 == 0) 0.9f else -0.9f)
      val batch = Seq((424242L, probe), (424243L, corpus.head._2))
        .toDF("vec_id", "embedding")
      val verdicts = StreamingSemDedup.gate(batch, idx).collect()
        .map(r => r.getLong(0) ->
          (r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .toMap
      val byId = corpus.toMap
      Seq(424242L -> probe, 424243L -> corpus.head._2).foreach {
        case (id, v) =>
          val (kept, keeper) = verdicts(id)
          val globalMax = corpus.map(c => cos6(v, c._2)).max
          if (globalMax < 0.42)
            assert(kept && keeper.isEmpty,
              s"$id: global max $globalMax < 0.42 but gate dropped")
          keeper.foreach(k => assert(cos6(v, byId(k)) >= 0.42,
            s"$id: keeper $k scores ${cos6(v, byId(k))} < threshold"))
      }
      // the exact copy is a guaranteed drop (its twin shares the
      // cluster at cosine 1.0)
      assert(!verdicts(424243L)._1, "exact corpus copy must drop")
    } finally idx.release()
  }
}
