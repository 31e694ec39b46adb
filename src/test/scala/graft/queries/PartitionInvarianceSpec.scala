package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Partition-count invariance sweep (round 10): every query's RESULT
  * VALUES must be identical under a different
  * `spark.sql.shuffle.partitions` — the local stand-in for "the
  * cluster got bigger". A distributed operator whose output depends
  * on the physical partitioning (a `first()` that reads arrival
  * order, a tie-break that leans on task layout, a sample keyed on
  * partition id) is nondeterministic at scale: the same 100 TB input
  * gives different answers on 200 vs 2000 executors, and the DuckDB
  * oracle — which the driver runs at ONE partitioning — can never
  * catch it.
  *
  * Rows are compared as multisets: the queries pin output ORDER only
  * up to their declared sort keys, so tie order among equal keys may
  * legitimately differ between partitionings (the driver's oracle
  * compare is order-insensitive for the same reason).
  */
class PartitionInvarianceSpec extends SparkSpec {

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name is invariant to shuffle partitioning") {
      val base = fn(spark, sfDir).collect().map(_.toString).sorted.toSeq
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        val alt = fn(spark, sfDir).collect().map(_.toString).sorted.toSeq
        assert(alt == base,
          s"$name values changed when shuffle partitions went $prev -> 7")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }
}
