package graft.queries

import graft.T._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series / windowed query inventory q17-q24 (SURVEY.md §2.3):
  * OHLCV, VWAP, sliding averages, cumulative depth, JSON/string/
  * timestamp scalar functions, exact dedup. These are the analytical
  * queries the reference's recorded trade/depth data implies
  * (README.md:47-77 of the reference).
  */
object TimeSeries {

  /** q17: tumbling-window OHLCV (1 day) — open/close picked as fully
    * tie-broken struct argmin/argmax (deterministic vs DuckDB, unlike
    * bare min_by/max_by on tied timestamps: event_id inside the
    * struct breaks every tie before `value` can matter).
    *
    * Scale shape: ONE partial-aggregatable groupBy — map-side combine
    * reduces each scan partition to O(days) partial rows, so the
    * exchange carries days, not events. The previous two per-day
    * row_number windows shuffled and buffered the whole corpus in
    * O(days) stripes just to pick first/last. */
  private def q17(s: SparkSession, d: String): DataFrame = {
    val e = tbl(s, d, "events")
      .withColumn("day", date_trunc("day", col("ts")))
    e.groupBy(col("day"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("close"),
        sum(dec(col("value"))).cast("double").as("volume"),
        count(lit(1)).as("n"))
      .select(ms(col("day")).as("day_ms"), col("open"), col("high"),
        col("low"), col("close"), col("volume"), col("n"))
      .orderBy("day_ms")
  }

  private val q17Sql =
    """WITH b AS (
      |  SELECT date_trunc('day', ts) AS day, value,
      |         row_number() OVER (PARTITION BY date_trunc('day', ts)
      |                            ORDER BY ts ASC, event_id ASC) AS rn_f,
      |         row_number() OVER (PARTITION BY date_trunc('day', ts)
      |                            ORDER BY ts DESC, event_id DESC) AS rn_l
      |  FROM events)
      |SELECT epoch_ms(CAST(day AS TIMESTAMP)) AS day_ms,
      |       max(CASE WHEN rn_f = 1 THEN value END) AS open,
      |       max(value) AS high, min(value) AS low,
      |       max(CASE WHEN rn_l = 1 THEN value END) AS close,
      |       CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS volume,
      |       count(*) AS n
      |FROM b GROUP BY day ORDER BY day_ms""".stripMargin

  /** q18: VWAP — Σ(price·qty)/Σ(qty), the trades-table price×quantity
    * semantics (spot_trades_etl.py:52-53). Decimal products keep both
    * sums exact; the single double division is IEEE-deterministic. */
  private def q18(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("l_extendedprice").cast("decimal(18,4)") *
          col("l_quantity").cast("decimal(12,4)")).as("pq"),
        sum(dec(col("l_quantity"))).as("q"))
      .select(col("l_returnflag"),
        (col("pq").cast("double") / col("q").cast("double")).as("vwap"),
        col("pq").cast("double").as("notional"),
        col("q").cast("double").as("volume"))
      .orderBy("l_returnflag")

  private val q18Sql =
    """SELECT l_returnflag,
      |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)
      |         / CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS vwap,
      |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS notional,
      |       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS volume
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q19: sliding 7-day average of event value — daily pre-aggregation
    * (exact decimal) + integer RANGE frame over day numbers, so missing
    * days are handled identically in both engines. */
  private def q19(s: SparkSession, d: String): DataFrame = {
    val daily = tbl(s, d, "events")
      .withColumn("day_num", dayNum(col("ts")))
      .groupBy(col("day_num"))
      .agg(sum(dec(col("value"))).as("day_sum"), count(lit(1)).as("day_n"))
    val w = Window.orderBy(col("day_num")).rangeBetween(-6, 0)
    daily
      .withColumn("s7", sum(col("day_sum")).over(w))
      .withColumn("n7", sum(col("day_n")).over(w))
      .select(col("day_num"),
        (col("s7").cast("double") / col("n7").cast("double")).as("avg7"),
        col("n7"))
      .orderBy("day_num")
  }

  private val q19Sql =
    """WITH daily AS (
      |  SELECT epoch_ms(CAST(date_trunc('day', ts) AS TIMESTAMP)) // 86400000 AS day_num,
      |         sum(CAST(value AS DECIMAL(18,6))) AS day_sum, count(*) AS day_n
      |  FROM events GROUP BY 1)
      |SELECT day_num,
      |       CAST(CAST(sum(day_sum) OVER w AS VARCHAR) AS DOUBLE) / CAST(sum(day_n) OVER w AS DOUBLE) AS avg7,
      |       CAST(sum(day_n) OVER w AS BIGINT) AS n7
      |FROM daily
      |WINDOW w AS (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
      |ORDER BY day_num""".stripMargin

  /** q20: cumulative book depth — running sum of quantity in price
    * order per side, the depth-chart query implied by the reference's
    * depth schema (README.md:50-61). Exact decimal running sums.
    *
    * Scale shape: the testdata analog partitions on `event_type` — 5
    * values — so each running-sum partition is a corpus stripe (the
    * real key is (symbol, side), fine-grained at production
    * cardinality, where each partition is ONE BOOK's levels). The
    * cumsum therefore rides the T.WindowRankCap fence: per-type
    * windows below 4M events, the distributed T.distCumSum above —
    * inclusive sum recovered as exclusive-prefix + own value, exact
    * in DECIMAL on both branches. */
  private def q20(s: SparkSession, d: String): DataFrame =
    fencedCumSum(s, d, "events",
      tbl(s, d, "events")
        // a depth event with no quantity is not a book level — and a
        // NULL in the window's ORDER BY would sort NULLS FIRST in
        // Spark but NULLS LAST in DuckDB (round-10 fuzz); the measure
        // domain is non-null by definition, oracle mirrored
        .filter(col("value").isNotNull)
        .select(col("event_type"), col("event_id"), col("value"))
        .withColumn("dv", dec(col("value"))),
      Seq("event_type"), Seq("value", "event_id"), "dv")
      .withColumn("cum_qty", (col("_dr_psum") + col("dv")).cast("double"))
      .select(col("event_type"), col("event_id"), col("value"), col("cum_qty"))
      .orderBy("event_type", "value", "event_id")

  private val q20Sql =
    """SELECT event_type, event_id, value,
      |       CAST(CAST(sum(CAST(value AS DECIMAL(18,6)))
      |            OVER (PARTITION BY event_type ORDER BY value ASC, event_id ASC
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS cum_qty
      |FROM events WHERE value IS NOT NULL
      |ORDER BY event_type, value, event_id""".stripMargin

  /** q21: JSON field extraction — the reference's per-message JSON
    * parsing surface (spot_trades_etl.py:45). */
  private def q21(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      // JSON parsing of the corpus is the whole query — pin the slim
      // (event_id, k) rows so the sort's range-sampling job never
      // re-parses props (see graft.T.pinnedSort)
      .transform(graft.T.pinnedSort(_, "event_id"))

  private val q21Sql =
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |FROM events ORDER BY event_id""".stripMargin

  /** q22: string functions — split/concat/lower/substr, the reference's
    * id formatting surface (factory.py:14, storage.py:57). */
  private def q22(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "part")
      .select(col("p_partkey"),
        lower(col("p_type")).as("type_lc"),
        element_at(split(col("p_type"), " "), 1).as("type_head"),
        concat_ws(".", col("p_brand"), col("p_type")).as("brand_type"),
        substring(col("p_name"), 1, 5).as("name5"),
        length(col("p_name")).cast("long").as("name_len"))
      .orderBy("p_partkey")

  private val q22Sql =
    """SELECT p_partkey, lower(p_type) AS type_lc,
      |       string_split(p_type, ' ')[1] AS type_head,
      |       concat_ws('.', p_brand, p_type) AS brand_type,
      |       substr(p_name, 1, 5) AS name5,
      |       CAST(length(p_name) AS BIGINT) AS name_len
      |FROM part ORDER BY p_partkey""".stripMargin

  /** q23: timestamp functions — epoch-ms round trip and calendar parts
    * (the reference keeps integer-ms timestamps, base.py:52). */
  private def q23(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "events")
      .select(col("event_id"),
        ms(col("ts")).as("ts_ms"),
        ms(date_trunc("hour", col("ts"))).as("hour_ms"),
        year(col("ts")).cast("long").as("y"),
        month(col("ts")).cast("long").as("m"),
        dayofmonth(col("ts")).cast("long").as("dom"),
        hour(col("ts")).cast("long").as("h"),
        ms(timestamp_millis(ms(col("ts")))).as("roundtrip_ms"))
      .orderBy("event_id")

  private val q23Sql =
    """SELECT event_id, epoch_ms(ts) AS ts_ms,
      |       epoch_ms(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS hour_ms,
      |       CAST(year(ts) AS BIGINT) AS y, CAST(month(ts) AS BIGINT) AS m,
      |       CAST(day(ts) AS BIGINT) AS dom, CAST(hour(ts) AS BIGINT) AS h,
      |       epoch_ms(make_timestamp(epoch_ms(ts) * 1000)) AS roundtrip_ms
      |FROM events ORDER BY event_id""".stripMargin

  /** q24: exact dedup — latest event per (user_id, event_type), the
    * `dropDuplicates` surface (SURVEY §2.2 late/duplicate row). */
  private def q24(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts").desc, col("event_id").desc)
    tbl(s, d, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        ms(col("ts")).as("ts_ms"))
      .orderBy("user_id", "event_type")
  }

  private val q24Sql =
    """SELECT user_id, event_type, event_id, epoch_ms(ts) AS ts_ms FROM (
      |  SELECT user_id, event_type, event_id, ts,
      |         row_number() OVER (PARTITION BY user_id, event_type
      |                            ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin

  /** q81: TWAP — time-weighted average value per (event_type, day),
    * each observation weighted by its holding time (milliseconds until
    * the next event of the same type that day; the day's last
    * observation carries no weight — the standard left-closed TWAP
    * convention). The market-data summary VWAP (q18) doesn't cover:
    * irregularly-spaced observations weighted by duration, not size.
    *
    * Scale shape: the lead() window and the groupBy share the same
    * (event_type, day) keys, so the whole query costs ONE exchange —
    * the window's sort-partition is already the aggregation's
    * distribution. Weighted terms go through the decimal cast so the
    * partial-agg fold is order-independent; each term is bounded by
    * max_value · 86.4e6 ms ≈ 4e10 < decimal(18,6)'s 1e12 capacity,
    * and the SUM widens to decimal(28,6) so it cannot overflow. */
  private def q81(s: SparkSession, d: String): DataFrame = {
    val e = tbl(s, d, "events")
      .withColumn("day", date_trunc("day", col("ts")))
      .withColumn("ts_ms", ms(col("ts")))
    // (event_type, day) partitions are corpus stripes — the lead rides
    // the T.WindowRankCap fence (plain lead window below 4M events,
    // rank + rank-shifted self-join above; T.fencedLead).
    fencedLead(s, d, "events",
      e.select(col("event_type"), col("day"), col("ts_ms"),
        col("event_id"), col("value")),
      Seq("event_type", "day"), Seq("ts_ms", "event_id"), "ts_ms")
      .withColumn("gap_ms", col("_dr_lead") - col("ts_ms"))
      .groupBy(col("event_type"), col("day"))
      .agg(
        count(lit(1)).as("n_events"),
        // dec(value) × gap, NOT dec(value × gap): the decimal cast of
        // an inexact double PRODUCT is cross-engine fragile — Spark
        // rounds the double's shortest string repr, DuckDB its exact
        // binary value, and the round-10 fuzz found a term where the
        // two differ by 1e-6 (a 1-ulp twap drift). Casting the
        // 2-decimal value alone is clean, and decimal × long is exact
        // in both engines.
        sum(dec(col("value")) * col("gap_ms")).as("vw"),
        sum(col("gap_ms")).as("w"))
      .filter(col("w") > 0)
      .select(col("event_type"), ms(col("day")).as("day_ms"),
        col("n_events"),
        // Raw IEEE division of exactly-agreed values — round(·, 6) on
        // a rational quotient risks the cross-engine decimal half-tie
        // q86 hit at sf0.1 (T.scala's ratio convention).
        (col("vw").cast("double") / col("w").cast("double")).as("twap"))
      .orderBy("event_type", "day_ms")
  }

  private val q81Sql =
    """WITH g AS (
      |  SELECT event_type, date_trunc('day', ts) AS day, value,
      |         lead(epoch_ms(ts)) OVER (PARTITION BY event_type, date_trunc('day', ts)
      |                                  ORDER BY epoch_ms(ts) ASC, event_id ASC)
      |           - epoch_ms(ts) AS gap_ms
      |  FROM events),
      |a AS (
      |  SELECT event_type, day, count(*) AS n_events,
      |         sum(CAST(value AS DECIMAL(18,6)) * gap_ms) AS vw,
      |         sum(gap_ms) AS w
      |  FROM g GROUP BY 1, 2)
      |SELECT event_type, epoch_ms(CAST(day AS TIMESTAMP)) AS day_ms, n_events,
      |       CAST(CAST(vw AS VARCHAR) AS DOUBLE) / CAST(w AS DOUBLE) AS twap
      |FROM a WHERE w > 0 ORDER BY event_type, day_ms""".stripMargin

  /** q89: 7-day rolling Pearson correlation between the daily 'view'
    * and 'purchase' value sums — the co-movement signal a market/
    * behavior dashboard tracks (q54's global corr, windowed). One
    * events scan: conditional decimal sums per day, then the six
    * rolling moments (n, Σx, Σy, Σxy, Σx², Σy²) over the SAME q19
    * integer-day RANGE frame, folded into the textbook corr formula.
    * Every op is +,-,*,/,sqrt over exactly-agreed values — raw output
    * per the T.scala exactness rule; degenerate windows (zero
    * variance) yield NULL identically in both engines.
    *
    * Scale shape: the corpus-sized work is ONE partial-aggregatable
    * groupBy(day); the rolling window runs over the O(days) daily
    * frame, not the event stream. */
  private def q89(s: SparkSession, d: String): DataFrame = {
    val daily = tbl(s, d, "events")
      .withColumn("day_num", dayNum(col("ts")))
      .groupBy(col("day_num"))
      .agg(
        sum(dec(when(col("event_type") === "view", col("value")).otherwise(0.0)))
          .cast("double").as("x"),
        sum(dec(when(col("event_type") === "purchase", col("value")).otherwise(0.0)))
          .cast("double").as("y"))
    val w = Window.orderBy(col("day_num")).rangeBetween(-6, 0)
    daily
      // product terms are cast to DECIMAL(38,6), not dec()'s (18,6):
      // squared daily sums cross 18,6's 1e12 capacity at ~28× this
      // corpus (daily sums grow linearly with scale) and ANSI mode
      // turns the overflow into a crash, not a null.
      .withColumn("n", count(lit(1)).over(w).cast("double"))
      .withColumn("sx", sum(dec(col("x"))).over(w).cast("double"))
      .withColumn("sy", sum(dec(col("y"))).over(w).cast("double"))
      .withColumn("sxy",
        sum((col("x") * col("y")).cast("decimal(38,6)")).over(w).cast("double"))
      .withColumn("sxx",
        sum((col("x") * col("x")).cast("decimal(38,6)")).over(w).cast("double"))
      .withColumn("syy",
        sum((col("y") * col("y")).cast("decimal(38,6)")).over(w).cast("double"))
      // greatest(0, ·) clamps the epsilon-negative variance doubles
      // can produce (sqrt of a negative diverges between engines);
      // the explicit denom > 0 CASE makes the degenerate window
      // (zero variance) NULL identically in BOTH engines — a bare
      // double division would yield NaN/±Inf (ANSI divide-by-zero
      // applies only to integral/decimal division), and NaN/Inf
      // comparison-and-hash parity is exactly the kind of accident
      // the oracle conventions exist to avoid.
      .withColumn("denom",
        sqrt(greatest(lit(0.0), col("n") * col("sxx") - col("sx") * col("sx"))) *
          sqrt(greatest(lit(0.0), col("n") * col("syy") - col("sy") * col("sy"))))
      .select(col("day_num"), col("n").cast("long").as("n_days"),
        when(col("denom") > 0.0,
          (col("n") * col("sxy") - col("sx") * col("sy")) / col("denom"))
          .as("corr7"))
      .orderBy("day_num")
  }

  private val q89Sql =
    """WITH daily AS (
      |  SELECT epoch_ms(CAST(date_trunc('day', ts) AS TIMESTAMP)) // 86400000 AS day_num,
      |         CAST(CAST(sum(CAST(CASE WHEN event_type = 'view' THEN value ELSE 0.0 END AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS x,
      |         CAST(CAST(sum(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS y
      |  FROM events GROUP BY 1),
      |r AS (
      |  SELECT day_num,
      |         CAST(count(*) OVER w AS DOUBLE) AS n,
      |         CAST(CAST(sum(CAST(x AS DECIMAL(18,6))) OVER w AS VARCHAR) AS DOUBLE) AS sx,
      |         CAST(CAST(sum(CAST(y AS DECIMAL(18,6))) OVER w AS VARCHAR) AS DOUBLE) AS sy,
      |         CAST(CAST(sum(CAST(x * y AS DECIMAL(38,6))) OVER w AS VARCHAR) AS DOUBLE) AS sxy,
      |         CAST(CAST(sum(CAST(x * x AS DECIMAL(38,6))) OVER w AS VARCHAR) AS DOUBLE) AS sxx,
      |         CAST(CAST(sum(CAST(y * y AS DECIMAL(38,6))) OVER w AS VARCHAR) AS DOUBLE) AS syy
      |  FROM daily
      |  WINDOW w AS (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
      |SELECT day_num, CAST(n AS BIGINT) AS n_days,
      |       CASE WHEN sqrt(greatest(0.0, n * sxx - sx * sx))
      |                 * sqrt(greatest(0.0, n * syy - sy * sy)) > 0.0
      |            THEN (n * sxy - sx * sy) /
      |                 (sqrt(greatest(0.0, n * sxx - sx * sx))
      |                  * sqrt(greatest(0.0, n * syy - sy * sy)))
      |       END AS corr7
      |FROM r ORDER BY day_num""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q81_twap" -> q81 _,
    "q89_rolling_corr" -> q89 _,
    "q17_tumbling_ohlcv" -> q17 _,
    "q18_vwap" -> q18 _,
    "q19_sliding_avg" -> q19 _,
    "q20_cum_book_depth" -> q20 _,
    "q21_json_extract" -> q21 _,
    "q22_string_fns" -> q22 _,
    "q23_ts_fns" -> q23 _,
    "q24_dedup_exact" -> q24 _)

  val oracles: Map[String, String] = Map(
    "q81_twap" -> q81Sql,
    "q89_rolling_corr" -> q89Sql,
    "q17_tumbling_ohlcv" -> q17Sql,
    "q18_vwap" -> q18Sql,
    "q19_sliding_avg" -> q19Sql,
    "q20_cum_book_depth" -> q20Sql,
    "q21_json_extract" -> q21Sql,
    "q22_string_fns" -> q22Sql,
    "q23_ts_fns" -> q23Sql,
    "q24_dedup_exact" -> q24Sql)
}
