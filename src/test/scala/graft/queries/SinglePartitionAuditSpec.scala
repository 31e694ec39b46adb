package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Suite-wide single-partition audit (round 10): every
  * `Exchange SinglePartition` in every query's EXECUTED post-AQE plan
  * must be structurally bounded — a partial aggregate or a local limit
  * sits beneath it, so the rows funneled into the one task are
  * O(groups)/O(limit), never O(corpus) — or the query must appear in
  * the fence whitelist below, naming the [[graft.T]] fence that bounds
  * the frame at scale (the plan can't show a fence; the flip tests
  * prove it).
  *
  * This is the mechanical closure of the round-7..10 fence campaign:
  * the per-query specs assert each KNOWN shape; this sweep makes an
  * UNKNOWN unbounded global pass — a new query with an unfenced
  * `Window.orderBy` directly over a scan/join, a global sort smuggled
  * in as a single-partition exchange — fail the suite with the
  * offending plan printed, instead of surviving until a 100 TB run
  * funnels the corpus through one task.
  *
  * The check is structural, so it is NECESSARY, not sufficient: an
  * aggregate below the exchange proves the funneled frame is grouped,
  * not that the groups are few (a per-document aggregate under a
  * global window passes here and is bounded only by the
  * [[graft.T.WindowRankCap]] fence — the flip tests in
  * PlanShapeSpec/DistRankSpec carry that half of the proof). What it
  * rules out mechanically is the worst class: a corpus funneled RAW
  * into one task.
  */
class SinglePartitionAuditSpec extends SparkSpec {

  /** Node classes that bound the row count flowing into a
    * single-partition exchange from below: a partial aggregate
    * (grouped rows), a local limit (≤ limit × partitions rows), or a
    * per-partition top-k. */
  private def isBounding(p: SparkPlan): Boolean = {
    val n = p.getClass.getSimpleName
    n.startsWith("HashAggregate") || n.startsWith("ObjectHashAggregate") ||
    n.startsWith("SortAggregate") || n.startsWith("LocalLimit") ||
    n.startsWith("TakeOrderedAndProject")
  }

  /** Queries whose single-partition pass is bounded by a [[graft.T]]
    * FENCE rather than by plan structure — each names the fence and
    * the spec that proves the flip. Every entry must stay justified
    * here; an unexplained addition is the regression this sweep
    * exists to catch. */
  private val fenceBounded: Map[String, String] = Map.empty

  test("ALL queries: every SinglePartition exchange sits above a partial aggregate, " +
      "a local limit, or a documented fence") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      if (fenceBounded.contains(name)) Seq.empty
      else {
        val exec = executedPlan(q(spark, sfDir))
        allPlanNodes(exec).collect {
          case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition &&
              !allPlanNodes(e.child).exists(isBounding) =>
            s"$name: unbounded SinglePartition exchange over:\n${e.child}"
        }
      }
    }
    assert(violations.isEmpty,
      s"suite-wide single-partition audit violated:\n${violations.mkString("\n\n")}")
  }
}
