package graft.queries

import graft.T._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General-analytics operator coverage q37-q45: the remaining surface
  * a user switching to this engine expects from a batch query engine —
  * outer joins, statistical moments, exact quantiles, pivot, cube,
  * subquery shapes, rank-function family, ordered array aggregation,
  * post-aggregation filtering. Determinism rules as in T.scala.
  */
object Extras {

  /** q61's histogram bin width — ONE home: the q61 chain, its oracle,
    * and q108's within-one-bin tolerance all derive from this (a
    * retune moves the audit's meaning with it). Declared first in the
    * object: vals initialize in order and both SQL vals interpolate
    * it. */
  private val HistBinW = 5.0

  /** q37: outer-join family — per-user purchase counts FULL OUTER
    * JOIN per-user error counts (nullable sides preserved). */
  private def q37(s: SparkSession, d: String): DataFrame = {
    val e = tbl(s, d, "events")
    def byType(t: String, n: String) =
      e.filter(col("event_type") === t).groupBy(col("user_id"))
        .agg(count(lit(1)).as(n))
    val p = byType("purchase", "purchase_n")
      .select(col("user_id").as("pu"), col("purchase_n"))
    val r = byType("error", "error_n")
      .select(col("user_id").as("eu"), col("error_n"))
    p.join(r, col("pu") === col("eu"), "full_outer")
      .select(coalesce(col("pu"), col("eu")).as("user_id"),
        col("purchase_n"), col("error_n"))
      .orderBy("user_id")
  }

  private val q37Sql =
    """WITH p AS (SELECT user_id, count(*) AS purchase_n FROM events
      |           WHERE event_type='purchase' GROUP BY 1),
      |e AS (SELECT user_id, count(*) AS error_n FROM events
      |      WHERE event_type='error' GROUP BY 1)
      |SELECT coalesce(p.user_id, e.user_id) AS user_id, purchase_n, error_n
      |FROM p FULL OUTER JOIN e ON p.user_id = e.user_id
      |ORDER BY user_id""".stripMargin

  /** q38: statistical moments from exact decimal sums — mean/variance/
    * stddev derived with an identical double expression tree in both
    * engines (never the engines' own var_samp, whose summation order
    * differs). */
  private def q38(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,4)")).as("sv"),
        sum(col("value").cast("decimal(12,4)") *
          col("value").cast("decimal(12,4)")).as("svv"))
      .select(col("event_type"), col("n"),
        (col("sv").cast("double") / col("n").cast("double")).as("mean"),
        ((col("svv").cast("double") - col("sv").cast("double") *
          col("sv").cast("double") / col("n").cast("double")) /
          (col("n").cast("double") - 1.0)).as("variance"))
      .withColumn("stddev", sqrt(col("variance")))
      .orderBy("event_type")

  private val q38Sql =
    """WITH a AS (
      |  SELECT event_type, count(*) AS n,
      |         sum(CAST(value AS DECIMAL(12,4))) AS sv,
      |         sum(CAST(value AS DECIMAL(12,4)) * CAST(value AS DECIMAL(12,4))) AS svv
      |  FROM events GROUP BY 1)
      |SELECT event_type, n,
      |       CAST(CAST(sv AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
      |       (CAST(CAST(svv AS VARCHAR) AS DOUBLE) - CAST(CAST(sv AS VARCHAR) AS DOUBLE)
      |          * CAST(CAST(sv AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE))
      |         / (CAST(n AS DOUBLE) - 1.0) AS variance,
      |       sqrt((CAST(CAST(svv AS VARCHAR) AS DOUBLE) - CAST(CAST(sv AS VARCHAR) AS DOUBLE)
      |          * CAST(CAST(sv AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE))
      |         / (CAST(n AS DOUBLE) - 1.0)) AS stddev
      |FROM a ORDER BY event_type""".stripMargin

  /** q82: z-score anomaly gate — events whose value sits ≥ 2.5 sample
    * standard deviations from their event_type's mean (the monitoring
    * outlier flag; complements q79's quantile gate with the parametric
    * version). Statistics reuse q38's exact decimal-moment shape
    * (identical sums ⇒ identical IEEE mean/std/z in both engines),
    * then broadcast back onto the stream: per-type stats are O(types)
    * rows, so the 100 TB side is scanned once and never shuffled —
    * flagging is a row-local comparison against 5 broadcast rows. */
  /** Per-type sample moments (event_type, mean, std) from exact
    * decimal sums — q82's stats side, public so the s18 streaming
    * gate builds its STATIC side from the identical definition. */
  def zStats(e: DataFrame): DataFrame =
    e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,4)")).as("sv"),
        sum(col("value").cast("decimal(12,4)") *
          col("value").cast("decimal(12,4)")).as("svv"))
      // degenerate types are EXCLUDED deterministically: n = 1 makes
      // the sample variance 0/0 (NaN) and zero variance makes z ±Inf —
      // without the gate every row of such a type would pass/fail on
      // NaN total-order semantics agreeing across engines by accident.
      // Excluding the stats row means no z is ever NaN/Inf; the s18
      // streaming gate shares this body, where a single-event type in
      // the static stats window is a plausible input.
      .filter(col("n") >= 2)
      .select(col("event_type"),
        (col("sv").cast("double") / col("n").cast("double")).as("mean"),
        sqrt((col("svv").cast("double") - col("sv").cast("double") *
          col("sv").cast("double") / col("n").cast("double")) /
          (col("n").cast("double") - 1.0)).as("std"))
      .filter(col("std") > 0.0)

  /** The z-score gate body — broadcast the O(types) stats frame onto
    * the event stream, flag |z| ≥ 2.5. ONE definition shared by batch
    * q82 and streaming s18 (stream-static broadcast join), so the two
    * provably agree row-for-row. */
  def zGate(e: DataFrame, stats: DataFrame): DataFrame =
    e.join(broadcast(stats), Seq("event_type"))
      .withColumn("z", (col("value") - col("mean")) / col("std"))
      .filter(abs(col("z")) >= 2.5)
      // z is emitted raw: both engines evaluate the identical IEEE
      // tree over exactly-agreed decimal moments, and round(·, 6)
      // would only add the cross-engine half-tie hazard q86 hit.
      .select(col("event_id"), col("event_type"), col("value"), col("z"))

  private def q82(s: SparkSession, d: String): DataFrame = {
    val e = tbl(s, d, "events")
    zGate(e, zStats(e)).orderBy("event_id")
  }

  private val q82Sql =
    """WITH a AS (
      |  SELECT event_type, count(*) AS n,
      |         sum(CAST(value AS DECIMAL(12,4))) AS sv,
      |         sum(CAST(value AS DECIMAL(12,4)) * CAST(value AS DECIMAL(12,4))) AS svv
      |  FROM events GROUP BY 1),
      |s AS (
      |  SELECT event_type, mean, std FROM (
      |    SELECT event_type,
      |           CAST(CAST(sv AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
      |           sqrt((CAST(CAST(svv AS VARCHAR) AS DOUBLE) - CAST(CAST(sv AS VARCHAR) AS DOUBLE)
      |              * CAST(CAST(sv AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE))
      |             / (CAST(n AS DOUBLE) - 1.0)) AS std
      |    FROM a WHERE n >= 2)
      |  WHERE std > 0)
      |SELECT event_id, event_type, value, (value - mean) / std AS z
      |FROM events JOIN s USING (event_type)
      |WHERE abs((value - mean) / std) >= 2.5
      |ORDER BY event_id""".stripMargin

  /** q39: exact median per group by explicit middle-row selection
    * (engine-native percentile_cont interpolation orders differ;
    * picking the middle one/two rows and averaging is deterministic).
    * Event types are a bounded enum, so each rank partition is a
    * corpus-sized slice — the rank rides the T.WindowRankCap fence
    * (per-type windows below 4M events, T.distRank above), like
    * q79/q96. q61 stays the shuffle-light sketch path. */
  private def q39(s: SparkSession, d: String): DataFrame =
    fencedRank(s, d, "events",
      tbl(s, d, "events")
        // the median's domain is non-null measures (SQL MEDIAN skips
        // NULLs; the rank formulation must see the same row set —
        // cross-engine NULL sort order differs, round-10 fuzz)
        .filter(col("value").isNotNull)
        .select(col("event_type"), col("event_id"), col("value")),
      Seq("event_type"), Seq("value", "event_id"))
      .withColumnRenamed("_dr_rank", "rn").withColumnRenamed("_dr_cnt", "n")
      .filter(col("rn") === expr("(n + 1) div 2") || col("rn") === expr("(n + 2) div 2"))
      .groupBy(col("event_type"))
      .agg((sum(col("value")) / count(lit(1)).cast("double")).as("median"),
        max(col("n")).as("n"))
      .orderBy("event_type")

  private val q39Sql =
    """WITH r AS (
      |  SELECT event_type, value,
      |         row_number() OVER (PARTITION BY event_type
      |                            ORDER BY value ASC, event_id ASC) AS rn,
      |         count(*) OVER (PARTITION BY event_type) AS n
      |  FROM events WHERE value IS NOT NULL)
      |SELECT event_type, sum(value) / CAST(count(*) AS DOUBLE) AS median, max(n) AS n
      |FROM r WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q108: quantile-sketch audit — per event type, q39's EXACT median
    * beside q61's binned p50 estimate, the absolute error, and the
    * one-bin-width tolerance flag. The calibration table for the last
    * uncovered sketch (q88 MinHash, q95 ANN, q97 IVF, q103 CMS, now
    * q61's histogram quantile) — what a pipeline owner reads before
    * swapping the exact sort quantile for the shuffle-light histogram
    * at a new bin width. Both sides and the error are exactly-agreed
    * value chains, so the audit itself is oracle bit-exact.
    *
    * Scale shape: composes the two member queries unchanged; the join
    * touches O(event-types) rows. */
  private def q108(s: SparkSession, d: String): DataFrame =
    q39(s, d)
      .join(q61(s, d).select(col("event_type"), col("p50_est")),
        Seq("event_type"))
      .select(col("event_type"), col("median").as("exact_median"),
        col("p50_est"),
        abs(col("median") - col("p50_est")).as("abs_err"),
        (abs(col("median") - col("p50_est")) <= HistBinW).as("within_bin"))
      .orderBy("event_type")

  // lazy: composes q61Sql, declared later in the file — a plain val
  // would capture null during object init. Forced only when the
  // oracles map (bottom of file) is built.
  private lazy val q108Sql =
    s"""WITH ex AS ($q39Sql),
      |es AS ($q61Sql)
      |SELECT ex.event_type, ex.median AS exact_median, es.p50_est,
      |       abs(ex.median - es.p50_est) AS abs_err,
      |       abs(ex.median - es.p50_est) <= $HistBinW AS within_bin
      |FROM ex JOIN es ON ex.event_type = es.event_type
      |ORDER BY ex.event_type""".stripMargin

  private val ProfileCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  /** q109: schema profile — the data-quality expectations table
    * (null count, distinct count, lexicographic min/max as strings)
    * for every documents column, computed in ONE pass: a single
    * global aggregate produces all 20 metrics, then a row-local
    * explode pivots them into one row per column. The
    * profile-before-you-train gate every ingestion run ships.
    *
    * Scale shape: one scan; the multi-distinct aggregate plans via
    * Spark's Expand (5× row multiplication map-side, partial-agg
    * combined) — shuffle volume is O(Σ per-column distincts), and
    * the explode touches one 21-column row. Min/max compare CAST
    * strings in both engines (lexicographic, so numeric columns
    * agree cross-engine by construction rather than by numeric-vs-
    * string accident). */
  private def q109(s: SparkSession, d: String): DataFrame = {
    val t = tbl(s, d, "documents")
    val metrics = count(lit(1)).as("n") +: ProfileCols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
      countDistinct(col(c)).as(s"${c}__distinct"),
      min(col(c).cast("string")).as(s"${c}__min"),
      max(col(c).cast("string")).as(s"${c}__max")))
    t.agg(metrics.head, metrics.tail: _*)
      .select(col("n"), explode(array(ProfileCols.map(c => struct(
        lit(c).as("col_name"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_str"),
        col(s"${c}__max").as("max_str"))): _*)).as("p"))
      .select(col("p.col_name").as("col_name"), col("n").as("n_rows"),
        col("p.n_nulls").as("n_nulls"), col("p.n_distinct").as("n_distinct"),
        col("p.min_str").as("min_str"), col("p.max_str").as("max_str"))
      .orderBy("col_name")
  }

  private val q109Sql = {
    val aggs = ProfileCols.map(c =>
      s"""sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS ${c}__nulls,
        |       count(DISTINCT $c) AS ${c}__distinct,
        |       min(CAST($c AS VARCHAR)) AS ${c}__min,
        |       max(CAST($c AS VARCHAR)) AS ${c}__max""".stripMargin)
      .mkString(",\n       ")
    val rows = ProfileCols.map(c =>
      s"""SELECT '$c' AS col_name, n AS n_rows,
        |       CAST(${c}__nulls AS BIGINT) AS n_nulls,
        |       CAST(${c}__distinct AS BIGINT) AS n_distinct,
        |       ${c}__min AS min_str, ${c}__max AS max_str FROM a""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""WITH a AS (
      |  SELECT count(*) AS n,
      |       $aggs
      |  FROM documents)
      |$rows
      |ORDER BY col_name""".stripMargin
  }

  /** q110: event-transition matrix — per-user Markov bigrams of the
    * event stream: for every (from, to) event-type pair, how often
    * `to` directly follows `from` in a user's timeline, with the
    * row-normalized transition probability. THE sequence-analytics
    * table behind funnel design (q78 hard-codes one path; this
    * surveys all of them) and session-behavior modeling.
    *
    * Scale shape: ONE hashpartitioning(user_id) exchange feeds the
    * lead() window (total order (ms, event_id) within user — ties are
    * deterministic), then the (from, to) rollup partial-aggregates to
    * ≤types² rows; the fraction window runs over that grouped frame
    * (q73's small-table-window discipline). */
  private def q110(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ms"), col("event_id"))
    tbl(s, d, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        ms(col("ts")).as("ms"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_from",
        sum(col("n")).over(Window.partitionBy("from_type")))
      // Raw IEEE division of exactly-agreed counts (T.scala rules).
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("n_from").cast("double")).as("p"))
      .orderBy("from_type", "to_type")
  }

  private val q110Sql =
    s"""WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms
      |  FROM events),
      |b AS (
      |  SELECT event_type AS from_type,
      |         lead(event_type, 1) OVER (PARTITION BY user_id
      |           ORDER BY ms, event_id) AS to_type
      |  FROM e),
      |g AS (
      |  SELECT from_type, to_type, count(*) AS n
      |  FROM b WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |       CAST(n AS DOUBLE) /
      |       CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
      |FROM g ORDER BY from_type, to_type""".stripMargin

  /** q40: pivot — per user-bucket counts pivoted by event_type
    * (explicit value list for a stable schema). */
  private def q40(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "events")
      // bucketing BY user requires a user — an anonymous event has no
      // bucket (round-10 fuzz: the NULL bucket row's dtype/order
      // diverges across engines), oracle mirrored
      .filter(col("user_id").isNotNull)
      .withColumn("bucket", (col("user_id") % 10).cast("long"))
      .groupBy(col("bucket"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("bucket")

  private val q40Sql =
    """SELECT CAST(user_id % 10 AS BIGINT) AS bucket,
      |       count(*) FILTER (event_type = 'click') AS click,
      |       count(*) FILTER (event_type = 'error') AS error,
      |       count(*) FILTER (event_type = 'purchase') AS purchase,
      |       count(*) FILTER (event_type = 'signup') AS signup,
      |       count(*) FILTER (event_type = 'view') AS view
      |FROM events WHERE user_id IS NOT NULL
      |GROUP BY 1 ORDER BY bucket""".stripMargin

  /** q41: cube — all grouping-set combinations of (event_type, bucket). */
  private def q41(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "events")
      .withColumn("bucket", (col("user_id") % 5).cast("long"))
      .cube(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(coalesce(col("event_type"), lit("~")),
        coalesce(col("bucket"), lit(-1L)))

  private val q41Sql =
    """SELECT event_type, bucket, count(*) AS n
      |FROM (SELECT event_type, CAST(user_id % 5 AS BIGINT) AS bucket FROM events)
      |GROUP BY CUBE (event_type, bucket)
      |ORDER BY coalesce(event_type, '~'), coalesce(bucket, -1)""".stripMargin

  /** q42: subquery shapes — scalar subquery (global mean as exact
    * decimal-sum/count) + IN subquery. The 1-row mean attaches via
    * `T.withScalar` (broadcast HASH join on a derived constant key)
    * like every other scalar in the suite, so the suite-wide no-BNLJ
    * plan invariant (PlanShapeSpec) holds with a single documented
    * exemption (the ≤8-row centroid assignment). */
  private def q42(s: SparkSession, d: String): DataFrame = {
    val e = tbl(s, d, "events")
    val stats = e.agg(
      (sum(dec(col("value"))).cast("double") /
        count(lit(1)).cast("double")).as("mean"))
    val building = tbl(s, d, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    withScalar(
      e.join(building, e("user_id") === building("c_custkey"), "left_semi"),
      stats)
      .filter(col("value") > col("mean"))
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy("event_id")
  }

  private val q42Sql =
    """SELECT event_id, user_id, value FROM events e
      |WHERE e.user_id IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |  AND e.value > (SELECT CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
      |                        / CAST(count(*) AS DOUBLE) FROM events)
      |ORDER BY event_id""".stripMargin

  /** q43: ordered set aggregation — distinct event types per user as a
    * sorted comma-joined string (collect_set is unordered; array_sort
    * makes it deterministic and DuckDB-identical). */
  private def q43(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "events")
      .groupBy(col("user_id"))
      .agg(concat_ws(",", array_sort(collect_set(col("event_type"))))
        .as("types"),
        countDistinct(col("event_type")).as("n_types"))
      .orderBy("user_id")

  private val q43Sql =
    """SELECT user_id,
      |       string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types,
      |       count(DISTINCT event_type) AS n_types
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q44: rank-function family with a total order — rank, dense_rank,
    * ntile, percent_rank, cume_dist (ratios are int-derived double
    * divisions, deterministic). The (value, event_id) order is TOTAL,
    * so every function is a closed form of (row_number, n): rank =
    * dense_rank = row_number, ntile via T.ntileFromRank, percent_rank
    * = (rn-1)/(n-1), cume_dist = rn/n — which lets the whole family
    * ride the T.WindowRankCap fence (per-type windows below 4M
    * events, T.distRank above; event types are a bounded enum, so
    * each partition is a corpus stripe). The oracle keeps the native
    * window functions: values coincide by the total order. */
  private def q44(s: SparkSession, d: String): DataFrame =
    fencedRank(s, d, "events",
      tbl(s, d, "events")
        // rank-by-measure defines its domain as non-null measures
        // (q39's rule; a NULL has no rank position and the two
        // engines default-sort it to opposite ends)
        .filter(col("value").isNotNull)
        .select(col("event_type"), col("event_id"), col("value")),
      Seq("event_type"), Seq("value", "event_id"))
      .withColumn("rnk", col("_dr_rank"))
      .withColumn("drnk", col("_dr_rank"))
      .withColumn("quartile", ntileFromRank(4, col("_dr_rank"), col("_dr_cnt")))
      .withColumn("prank",
        // SQL percent_rank is 0 for a single-row partition; the raw
        // closed form would be 0/0 there
        when(col("_dr_cnt") === 1, 0.0).otherwise(
          (col("_dr_rank") - 1).cast("double") /
            (col("_dr_cnt") - 1).cast("double")))
      .withColumn("cdist",
        col("_dr_rank").cast("double") / col("_dr_cnt").cast("double"))
      .select(col("event_type"), col("event_id"), col("value"),
        col("rnk"), col("drnk"), col("quartile"), col("prank"), col("cdist"))
      .orderBy("event_type", "rnk")

  private val q44Sql =
    """SELECT event_type, event_id, value,
      |       CAST(rank() OVER w AS BIGINT) AS rnk,
      |       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
      |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |       percent_rank() OVER w AS prank,
      |       cume_dist() OVER w AS cdist
      |FROM events WHERE value IS NOT NULL
      |WINDOW w AS (PARTITION BY event_type ORDER BY value ASC, event_id ASC)
      |ORDER BY event_type, rnk""".stripMargin

  /** q45: post-aggregation filter (HAVING) — users with ≥ 4 distinct
    * event types and above-threshold exact spend. */
  private def q45(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "events")
      .groupBy(col("user_id"))
      .agg(countDistinct(col("event_type")).as("n_types"),
        sum(dec(col("value"))).cast("double").as("total"))
      .filter(col("n_types") >= 4 && col("total") > 100.0)
      .orderBy("user_id")

  private val q45Sql =
    """SELECT user_id, count(DISTINCT event_type) AS n_types,
      |       CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total
      |FROM events GROUP BY user_id
      |HAVING count(DISTINCT event_type) >= 4
      |   AND CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) > 100.0
      |ORDER BY user_id""".stripMargin

  /** q50: scalar-function breadth — the remaining string/date surface
    * (regexp_replace, padding, trim/reverse/repeat, substring search,
    * interval arithmetic) with portable semantics in both engines. */
  private def q50(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "part")
      .select(col("p_partkey"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        lpad(col("p_brand"), 12, "#").as("lpadded"),
        rpad(col("p_brand"), 12, "#").as("rpadded"),
        reverse(col("p_type")).as("reversed"),
        repeat(col("p_brand"), 2).as("doubled"),
        instr(col("p_type"), "ED").cast("long").as("ed_pos"),
        trim(lit("  pad  ")).as("trimmed"),
        translate(col("p_type"), "AEIOU", "aeiou").as("translated"))
      .orderBy("p_partkey")

  private val q50Sql =
    """SELECT p_partkey,
      |       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
      |       lpad(p_brand, 12, '#') AS lpadded,
      |       rpad(p_brand, 12, '#') AS rpadded,
      |       reverse(p_type) AS reversed,
      |       repeat(p_brand, 2) AS doubled,
      |       CAST(strpos(p_type, 'ED') AS BIGINT) AS ed_pos,
      |       trim('  pad  ') AS trimmed,
      |       translate(p_type, 'AEIOU', 'aeiou') AS translated
      |FROM part ORDER BY p_partkey""".stripMargin

  /** q51: range join — for each purchase event, how many 'view'
    * events the same user produced in the trailing 24 hours (both
    * sides time-overlapping, so the binning and boundary logic are
    * genuinely verified). A naive range predicate plans a nested-loop
    * join; the scalable shape used here buckets both sides by
    * (user, day-bin) — purchases explode into their 2 candidate bins
    * — turning it into an equi-join plus an exact range filter.
    * Zero-count purchases are kept (left join). */
  private def q51(s: SparkSession, d: String): DataFrame = {
    val e = tbl(s, d, "events")
    val views = e.filter(col("event_type") === "view").select(
      col("user_id").as("vuser"),
      dayNum(col("ts")).as("vday"),
      col("ts").as("vts"))
    val purchases = e.filter(col("event_type") === "purchase").select(
      col("event_id"),
      col("user_id").as("puser"),
      col("ts").as("pts"),
      explode(sequence(
        dayNum(col("ts")) - 1,
        dayNum(col("ts"))))
        .as("pday"))
    purchases
      .join(views, col("puser") === col("vuser") && col("pday") === col("vday"),
        "left")
      .groupBy(col("event_id"))
      .agg(count(when(
        col("vts") >= col("pts") - expr("INTERVAL 24 HOURS") &&
          col("vts") <= col("pts"), 1)).as("n_views"))
      .orderBy("event_id")
  }

  private val q51Sql =
    """SELECT p.event_id,
      |       (SELECT count(*) FROM events v
      |        WHERE v.user_id = p.user_id AND v.event_type = 'view'
      |          AND v.ts >= p.ts - INTERVAL 24 HOURS
      |          AND v.ts <= p.ts) AS n_views
      |FROM events p WHERE p.event_type = 'purchase'
      |ORDER BY event_id""".stripMargin

  /** q54: correlation/regression aggregate family (corr, covar_pop,
    * covar_samp, regr slope/intercept/r²) between event value and
    * event day, per event type. Like q38, every statistic is derived
    * from EXACT sums (decimal for value-terms, integer for day-terms)
    * through a double expression tree written identically in the
    * oracle — never the engines' own corr/covar/regr_* aggregates,
    * whose internal summation orders differ between engines. */
  private def q54(s: SparkSession, d: String): DataFrame = {
    val base = tbl(s, d, "events")
      .select(col("event_type"),
        col("value").cast("decimal(12,4)").as("x"),
        dayNum(col("ts")).as("y"))
    val agg = base.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y").cast("decimal(12,4)")).as("sxy"))
    val dbl = agg.select(col("event_type"), col("n"),
      col("n").cast("double").as("nd"),
      col("sx").cast("double").as("dx"),
      col("sy").cast("double").as("dy"),
      col("sxx").cast("double").as("dxx"),
      col("syy").cast("double").as("dyy"),
      col("sxy").cast("double").as("dxy"))
    val cov = col("dxy") - col("dx") * col("dy") / col("nd")
    val corrNum = col("nd") * col("dxy") - col("dx") * col("dy")
    val varX = col("nd") * col("dxx") - col("dx") * col("dx")
    val varY = col("nd") * col("dyy") - col("dy") * col("dy")
    val slope = corrNum / varX
    val corr = corrNum / (sqrt(varX) * sqrt(varY))
    dbl.select(col("event_type"), col("n"),
        (col("dx") / col("nd")).as("mean_x"),
        (col("dy") / col("nd")).as("mean_y"),
        (cov / col("nd")).as("covar_pop"),
        (cov / (col("nd") - 1.0)).as("covar_samp"),
        corr.as("corr_xy"),
        (corr * corr).as("r2"),
        slope.as("slope"),
        ((col("dy") - slope * col("dx")) / col("nd")).as("intercept"))
      .orderBy("event_type")
  }

  private val q54Sql =
    """WITH a AS (
      |  SELECT event_type, count(*) AS n,
      |         sum(CAST(value AS DECIMAL(12,4))) AS sx,
      |         sum(y) AS sy,
      |         sum(CAST(value AS DECIMAL(12,4)) * CAST(value AS DECIMAL(12,4))) AS sxx,
      |         sum(y * y) AS syy,
      |         sum(CAST(value AS DECIMAL(12,4)) * CAST(y AS DECIMAL(12,4))) AS sxy
      |  FROM (SELECT event_type, value,
      |               epoch_ms(CAST(date_trunc('day', ts) AS TIMESTAMP)) // 86400000 AS y
      |        FROM events)
      |  GROUP BY 1),
      |d AS (
      |  SELECT event_type, n,
      |         CAST(n AS DOUBLE) AS nd,
      |         CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS dx,
      |         CAST(sy AS DOUBLE) AS dy,
      |         CAST(CAST(sxx AS VARCHAR) AS DOUBLE) AS dxx,
      |         CAST(syy AS DOUBLE) AS dyy,
      |         CAST(CAST(sxy AS VARCHAR) AS DOUBLE) AS dxy
      |  FROM a)
      |SELECT event_type, n,
      |       dx / nd AS mean_x,
      |       dy / nd AS mean_y,
      |       (dxy - dx * dy / nd) / nd AS covar_pop,
      |       (dxy - dx * dy / nd) / (nd - 1.0) AS covar_samp,
      |       (nd * dxy - dx * dy)
      |         / (sqrt(nd * dxx - dx * dx) * sqrt(nd * dyy - dy * dy)) AS corr_xy,
      |       ((nd * dxy - dx * dy)
      |         / (sqrt(nd * dxx - dx * dx) * sqrt(nd * dyy - dy * dy)))
      |       * ((nd * dxy - dx * dy)
      |         / (sqrt(nd * dxx - dx * dx) * sqrt(nd * dyy - dy * dy))) AS r2,
      |       (nd * dxy - dx * dy) / (nd * dxx - dx * dx) AS slope,
      |       (dy - ((nd * dxy - dx * dy) / (nd * dxx - dx * dx)) * dx) / nd AS intercept
      |FROM d ORDER BY event_type""".stripMargin

  /** q56: gap-based sessionization — the classic event-stream
    * operator a behavioral pipeline runs: per user, a new session
    * starts when the gap to the previous event exceeds 30 minutes;
    * session id = running count of session breaks (lag → gap flag →
    * cumulative sum), then one row per session with span and
    * composition. Shape: two windows over the same
    * (user, ts)-partitioned sort — one shuffle, both windows reuse
    * it — then a partial-aggregable groupBy on (user, session). */
  private def q56(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tbl(s, d, "events")
      .withColumn("prev_ms", unix_millis(lag(col("ts"), 1).over(w)))
      .withColumn("brk",
        when(col("prev_ms").isNull ||
          unix_millis(col("ts")) - col("prev_ms") > 30L * 60 * 1000, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("brk")).over(run))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(unix_millis(col("ts"))).as("start_ms"),
        max(unix_millis(col("ts"))).as("end_ms"),
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"))
      .orderBy("user_id", "session_id")
  }

  private val q56Sql =
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts, event_type, epoch_ms(ts) AS ms,
      |         CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
      |                OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
      |              THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, event_type, ms,
      |         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |           AS session_id
      |  FROM flagged)
      |SELECT user_id, session_id,
      |       CAST(min(ms) AS BIGINT) AS start_ms,
      |       CAST(max(ms) AS BIGINT) AS end_ms,
      |       count(*) AS n_events,
      |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_purchases
      |FROM sess GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin

  /** q78: conversion funnel — per user, the first 'view', the first
    * 'click' STRICTLY AFTER that view, and the first 'purchase'
    * strictly after that click (the classic ordered-funnel semantics:
    * a click before any view doesn't count). Three chained MIN-CASE
    * windows over the SAME unordered user partition — one
    * hashpartitioning(user_id) exchange feeds all three WindowExecs,
    * then a per-user groupBy collapses to one row. No join, no sort
    * beyond the window's partition sort — q56's single-shuffle
    * sessionization discipline applied to funnel analysis. */
  private def q78(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    tbl(s, d, "events")
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("tms"))
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("tms"))).over(w))
      .withColumn("t_click",
        min(when(col("event_type") === "click" && col("tms") > col("t_view"),
          col("tms"))).over(w))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" && col("tms") > col("t_click"),
          col("tms"))).over(w))
      .groupBy(col("user_id"))
      .agg(min(col("t_view")).as("t_view_ms"),
        min(col("t_click")).as("t_click_ms"),
        min(col("t_purchase")).as("t_purchase_ms"))
      .withColumn("converted", col("t_purchase_ms").isNotNull)
      .orderBy("user_id")
  }

  private val q78Sql =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_ms(ts) AS tms FROM events),
      |v AS (
      |  SELECT *, min(CASE WHEN event_type = 'view' THEN tms END)
      |              OVER (PARTITION BY user_id) AS t_view FROM e),
      |c AS (
      |  SELECT *, min(CASE WHEN event_type = 'click' AND tms > t_view
      |                     THEN tms END)
      |              OVER (PARTITION BY user_id) AS t_click FROM v),
      |p AS (
      |  SELECT *, min(CASE WHEN event_type = 'purchase' AND tms > t_click
      |                     THEN tms END)
      |              OVER (PARTITION BY user_id) AS t_purchase FROM c)
      |SELECT user_id,
      |       CAST(min(t_view) AS BIGINT) AS t_view_ms,
      |       CAST(min(t_click) AS BIGINT) AS t_click_ms,
      |       CAST(min(t_purchase) AS BIGINT) AS t_purchase_ms,
      |       (min(t_purchase) IS NOT NULL) AS converted
      |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q61: histogram quantile sketch — the partial-aggregatable
    * quantile shape at scale: per event type, values land in fixed
    * 5-wide bins (shuffle volume = #bins per group, independent of row
    * count), and p50/p90/p99 are estimated as the lower edge of the
    * first bin whose cumulative count crosses the target. The crossing
    * test is `cum·100 ≥ total·p` — pure integer arithmetic, no
    * ceil-division for engines to round differently. (q39 is the exact
    * median; this is the sketch that replaces it at 100 TB.) */
  private def q61(s: SparkSession, d: String): DataFrame = {
    val bins = tbl(s, d, "events")
      // histogram domain = non-null measures (the q39/q44 rule: a
      // NULL bin would ride the cum window's engine-default NULL
      // order)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") / HistBinW).cast("long").as("bin"))
      .groupBy("event_type", "bin").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("event_type").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("event_type")
    val cum = bins
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("total", sum(col("c")).over(wAll))
    def est(p: Int) =
      (min(when(col("cum") * 100 >= col("total") * p, col("bin"))) * HistBinW)
        .as(s"p${p}_est")
    cum.groupBy(col("event_type"))
      .agg(max(col("total")).as("total"), est(50), est(90), est(99))
      .orderBy("event_type")
  }

  private val q61Sql =
    s"""WITH bins AS (
      |  SELECT event_type, CAST(floor(value / $HistBinW) AS BIGINT) AS bin,
      |         count(*) AS c
      |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      |cum AS (
      |  SELECT event_type, bin, c,
      |         sum(c) OVER (PARTITION BY event_type ORDER BY bin
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |         sum(c) OVER (PARTITION BY event_type) AS total
      |  FROM bins)
      |SELECT event_type, CAST(max(total) AS BIGINT) AS total,
      |       min(CASE WHEN cum*100 >= total*50 THEN bin END) * $HistBinW AS p50_est,
      |       min(CASE WHEN cum*100 >= total*90 THEN bin END) * $HistBinW AS p90_est,
      |       min(CASE WHEN cum*100 >= total*99 THEN bin END) * $HistBinW AS p99_est
      |FROM cum GROUP BY 1 ORDER BY 1""".stripMargin

  /** q66: time-RANGE window frame — trailing 7-day activity per user
    * at every event (the frame is bounded by the ORDER-BY VALUE, not a
    * row count — the window surface q19/q44's ROWS frames don't
    * cover). Peers at the same timestamp are all in-frame by
    * definition, so results are tie-order independent; the sum is
    * decimal-exact. One (user, ms) sort shuffle, like q56. */
  private def q66(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ms")
      .rangeBetween(-7L * 86400000L, 0L)
    tbl(s, d, "events")
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("trailing_n", count(lit(1)).over(w))
      .withColumn("trailing_sum", sum(dec(col("value"))).over(w).cast("double"))
      .select(col("event_id"), col("user_id"), col("ms"),
        col("trailing_n"), col("trailing_sum"))
      .orderBy("event_id")
  }

  private val q66Sql =
    """SELECT event_id, user_id, ms,
      |       count(*) OVER w AS trailing_n,
      |       CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS VARCHAR) AS DOUBLE) AS trailing_sum
      |FROM (SELECT event_id, user_id, epoch_ms(ts) AS ms, value FROM events)
      |WINDOW w AS (PARTITION BY user_id ORDER BY ms
      |             RANGE BETWEEN 604800000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** q67: GROUPING SETS — the generalization rollup (q16) and cube
    * (q41) are special cases of: per-type totals, per-bucket totals,
    * and the grand total in ONE pass (Spark plans a single Expand +
    * aggregate, not three scans), with grouping_id disambiguating the
    * null-vs-aggregated levels. */
  private def q67(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "events")
      .withColumn("bucket", (col("user_id") % 10).cast("long"))
      .groupingSets(
        Seq(Seq(col("event_type")), Seq(col("bucket")), Seq()),
        col("event_type"), col("bucket"))
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("total"))
      .select(col("gid"), col("event_type"), col("bucket"), col("n"), col("total"))
      .orderBy(col("gid"),
        coalesce(col("event_type"), lit("~")),
        coalesce(col("bucket"), lit(-1L)))

  private val q67Sql =
    """SELECT CAST(GROUPING(event_type, bucket) AS BIGINT) AS gid,
      |       event_type, bucket, count(*) AS n,
      |       CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total
      |FROM (SELECT event_type, CAST(user_id % 10 AS BIGINT) AS bucket, value FROM events)
      |GROUP BY GROUPING SETS ((event_type), (bucket), ())
      |ORDER BY gid, coalesce(event_type, '~'), coalesce(bucket, -1)""".stripMargin

  /** q104: retention cohorts — the canonical product-analytics matrix:
    * users cohorted by FIRST active day, then distinct active users
    * per (cohort day, day offset). The engagement-decay table every
    * event pipeline ships; here it doubles as the user-activity-span
    * profile a per-user training split (q99) is tuned against.
    *
    * Scale shape: the cohort day attaches by a per-user window MIN —
    * ONE hashpartitioning(user_id) exchange, no join-back — and the
    * matrix is a (cohort, offset) distinct-agg whose output is
    * O(days²) regardless of event volume. All integers; exact in both
    * engines. */
  private def q104(s: SparkSession, d: String): DataFrame = {
    val e = tbl(s, d, "events")
      .select(col("user_id"), dayNum(col("ts")).as("day"))
    e.withColumn("cohort",
        min(col("day")).over(Window.partitionBy("user_id")))
      .groupBy(col("cohort").as("cohort_day"),
        (col("day") - col("cohort")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy("cohort_day", "day_offset")
  }

  private val q104Sql =
    s"""WITH e AS (
      |  SELECT user_id, ${dayNumSql("ts")} AS day FROM events),
      |c AS (
      |  SELECT user_id, day,
      |         min(day) OVER (PARTITION BY user_id) AS cohort
      |  FROM e)
      |SELECT cohort AS cohort_day, day - cohort AS day_offset,
      |       count(DISTINCT user_id) AS n_active
      |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q104_retention_cohorts" -> q104 _,
    "q108_quantile_audit" -> q108 _,
    "q109_schema_profile" -> q109 _,
    "q110_event_transitions" -> q110 _,
    "q66_range_frame" -> q66 _,
    "q67_grouping_sets" -> q67 _,
    "q61_histogram_quantiles" -> q61 _,
    "q56_sessionize" -> q56 _,
    "q78_event_funnel" -> q78 _,
    "q54_corr_regr" -> q54 _,
    "q51_range_join" -> q51 _,
    "q50_scalar_fns" -> q50 _,
    "q37_outer_join_family" -> q37 _,
    "q38_stats_moments" -> q38 _,
    "q82_zscore_anomaly" -> q82 _,
    "q39_median_exact" -> q39 _,
    "q40_pivot" -> q40 _,
    "q41_cube" -> q41 _,
    "q42_subqueries" -> q42 _,
    "q43_array_agg" -> q43 _,
    "q44_rank_fns" -> q44 _,
    "q45_having" -> q45 _)

  val oracles: Map[String, String] = Map(
    "q66_range_frame" -> q66Sql,
    "q67_grouping_sets" -> q67Sql,
    "q61_histogram_quantiles" -> q61Sql,
    "q104_retention_cohorts" -> q104Sql,
    "q108_quantile_audit" -> q108Sql,
    "q109_schema_profile" -> q109Sql,
    "q110_event_transitions" -> q110Sql,
    "q56_sessionize" -> q56Sql,
    "q78_event_funnel" -> q78Sql,
    "q54_corr_regr" -> q54Sql,
    "q51_range_join" -> q51Sql,
    "q50_scalar_fns" -> q50Sql,
    "q37_outer_join_family" -> q37Sql,
    "q38_stats_moments" -> q38Sql,
    "q82_zscore_anomaly" -> q82Sql,
    "q39_median_exact" -> q39Sql,
    "q40_pivot" -> q40Sql,
    "q41_cube" -> q41Sql,
    "q42_subqueries" -> q42Sql,
    "q43_array_agg" -> q43Sql,
    "q44_rank_fns" -> q44Sql,
    "q45_having" -> q45Sql)
}
