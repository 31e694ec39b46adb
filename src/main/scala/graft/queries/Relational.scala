package graft.queries

import graft.T._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch relational operator inventory q01-q16 (SURVEY.md §2.3).
  *
  * Each query re-expresses a dataflow capability of the reference
  * (anselumana/binance-etl; citations per query) over the driver's
  * test tables, with an ANSI-SQL DuckDB oracle. All are plain
  * `org.apache.spark.sql` — Catalyst handles pushdown/pruning/join
  * selection; the only hints used are fenced dimension broadcasts
  * (T.hintIdSet — q11/q101/q102 and q59's customer dim) and the
  * bounded nation/region broadcasts in q64.
  */
object Relational {

  /** q01: projection + rename — reference's field mapping
    * (spot_trades_etl.py:48-55). */
  private def q01(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "lineitem")
      .select(
        col("l_orderkey").as("order_id"),
        col("l_linenumber").cast("long").as("line_no"),
        col("l_partkey").as("part_id"),
        col("l_quantity").as("qty"),
        col("l_extendedprice").as("price"))
      .orderBy("order_id", "line_no")

  private val q01Sql =
    """SELECT l_orderkey AS order_id, CAST(l_linenumber AS BIGINT) AS line_no,
      |       l_partkey AS part_id, l_quantity AS qty, l_extendedprice AS price
      |FROM lineitem ORDER BY order_id, line_no""".stripMargin

  /** q02: event-type filter — reference's `e == 'trade'` gate
    * (spot_trades_etl.py:47). Filter is pushed to the parquet scan. */
  private def q02(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), ms(col("ts")).as("ts_ms"),
        col("value"))
      .orderBy("event_id")

  private val q02Sql =
    """SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value
      |FROM events WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin

  /** q03: conditional scalar map — reference's `'sell' if m else 'buy'`
    * (spot_trades_etl.py:54). */
  private def q03(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "events")
      .select(col("event_id"),
        when(col("value") >= 100.0, "sell").otherwise("buy").as("side"),
        col("value"))
      .orderBy("event_id")

  private val q03Sql =
    """SELECT event_id, CASE WHEN value >= 100.0 THEN 'sell' ELSE 'buy' END AS side, value
      |FROM events ORDER BY event_id""".stripMargin

  /** q04: explode array to rows — reference's bids/asks level explosion
    * (spot_depth_etl.py:92-110). 1-based pos to match DuckDB
    * generate_subscripts. */
  private def q04(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos0", "v")))
      .select(col("vec_id"), (col("pos0") + 1).cast("long").as("pos"),
        col("v").cast("double").as("v"))
      .orderBy("vec_id", "pos")

  private val q04Sql =
    """SELECT vec_id, CAST(pos AS BIGINT) AS pos, CAST(v AS DOUBLE) AS v
      |FROM (SELECT vec_id, unnest(embedding) AS v,
      |             generate_subscripts(embedding, 1) AS pos FROM embeddings)
      |ORDER BY vec_id, pos""".stripMargin

  /** q05: union of two labeled projections — reference's bids ∪ asks
    * with literal side columns (spot_depth_etl.py:111). */
  private def q05(s: SparkSession, d: String): DataFrame = {
    val e = tbl(s, d, "events")
    val a = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), lit("buy_side").as("side"), col("value"))
    val b = e.filter(col("event_type") === "view")
      .select(col("event_id"), lit("view_side").as("side"), col("value"))
    a.unionByName(b).orderBy("event_id")
  }

  private val q05Sql =
    """SELECT event_id, 'buy_side' AS side, value FROM events WHERE event_type='purchase'
      |UNION ALL
      |SELECT event_id, 'view_side' AS side, value FROM events WHERE event_type='view'
      |ORDER BY event_id""".stripMargin

  /** q06: global sort — reference's sort_values(['timestamp','side'])
    * (spot_depth_etl.py:111), tie-broken to a total order. */
  private def q06(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "events")
      .select(ms(col("ts")).as("ts_ms"), col("event_type"), col("event_id"))
      .orderBy("ts_ms", "event_type", "event_id")

  private val q06Sql =
    """SELECT epoch_ms(ts) AS ts_ms, event_type, event_id
      |FROM events ORDER BY ts_ms, event_type, event_id""".stripMargin

  /** q07: gap detection — batch analog of the reference's
    * `U != prev_u + 1` contiguity check (spot_depth_etl.py:78-90). */
  private def q07(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    tbl(s, d, "events")
      .select(col("user_id"), col("event_id"))
      .withColumn("prev_id", lag(col("event_id"), 1).over(w))
      .filter(col("prev_id").isNotNull && col("event_id") =!= col("prev_id") + 1)
      .orderBy("user_id", "event_id")
  }

  private val q07Sql =
    """SELECT user_id, event_id, prev_id FROM (
      |  SELECT user_id, event_id,
      |         lag(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_id
      |  FROM events)
      |WHERE prev_id IS NOT NULL AND event_id <> prev_id + 1
      |ORDER BY user_id, event_id""".stripMargin

  /** q08: anti-join stale filter — the reference's "drop deltas already
    * covered by the snapshot" shape (book_utils.py:35). */
  private def q08(s: SparkSession, d: String): DataFrame = {
    val e = tbl(s, d, "events")
    val c = tbl(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    e.join(c, e("user_id") === c("c_custkey"), "left_anti")
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy("event_id")
  }

  private val q08Sql =
    """SELECT event_id, user_id, event_type FROM events e
      |WHERE NOT EXISTS (SELECT 1 FROM customer c
      |                  WHERE c.c_custkey = e.user_id AND c.c_mktsegment = 'BUILDING')
      |ORDER BY event_id""".stripMargin

  /** q09: grouped counters + batch math — reference's per-stream message
    * and batch counters with batch_size=1000 (storage.py:24-36). */
  private def q09(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("n"),
        ceil(col("n") / lit(1000.0)).cast("long").as("batches"))
      .orderBy("event_type")

  private val q09Sql =
    """SELECT event_type, count(*) AS n,
      |       CAST(ceil(count(*) / 1000.0) AS BIGINT) AS batches
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q10: equi-join enrichment (orders ⋈ customer). At scale this is a
    * shuffle join on the key; AQE may elect broadcast when the dim fits. */
  private def q10(s: SparkSession, d: String): DataFrame = {
    val o = tbl(s, d, "orders")
    val c = tbl(s, d, "customer")
    o.join(c, o("o_custkey") === c("c_custkey"), "inner")
      .select(col("o_orderkey"), col("c_name"), col("c_mktsegment"),
        col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  private val q10Sql =
    """SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_orderkey""".stripMargin

  /** q11: broadcast dimension join — part is small RELATIVE to
    * lineitem but still grows with the platform (a catalog, not a
    * bounded enum like region/nation), so the hint rides the id fence
    * (T.hintIdSet): explicit broadcast below 2M parts — no shuffle of
    * the fact side, every test scale — and a shuffled hash build past
    * the cap instead of an OOM'd driver collect. */
  private def q11(s: SparkSession, d: String): DataFrame = {
    val l = tbl(s, d, "lineitem")
    val p = tbl(s, d, "part")
    l.join(hintIdSet(s, d, "part", p), l("l_partkey") === p("p_partkey"), "inner")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_extendedprice"))).cast("double").as("revenue"))
      .orderBy("p_brand")
  }

  private val q11Sql =
    """SELECT p_brand, count(*) AS n,
      |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** q12: semi-join — customers having orders (EXISTS shape of
    * book_utils.py:35). */
  private def q12(s: SparkSession, d: String): DataFrame = {
    val c = tbl(s, d, "customer")
    val o = tbl(s, d, "orders").select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  private val q12Sql =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** q13: as-of join — the reference's snapshot/delta alignment shape
    * `U <= lastUpdateId+1 <= u` (book_utils.py:41-44): for each
    * purchase event, the most recent 'view' event at or before it by
    * the same user. Both sides come from the time-overlapping events
    * table so the alignment logic is genuinely exercised (an
    * orders-vs-events version verifies vacuously: the tables' time
    * ranges are decades apart). Implemented scalably as union +
    * running `last(ignoreNulls)` window — one shuffle, no row
    * explosion, no correlated subquery. */
  private def q13(s: SparkSession, d: String): DataFrame = {
    val e = tbl(s, d, "events")
    // JOIN-KEY equality semantics: a view with no user can never be
    // "the same user's last view", but the window's partition-by
    // groups NULL buckets null-SAFELY — without this filter a
    // NULL-user purchase would as-of-match another NULL-user's view
    // where the oracle's `v.user_id = p.user_id` matches nothing
    // (round-10 fuzz). NULL-user purchases still emit, with NULL
    // last_view_ms, exactly as SQL does.
    val views = e.filter(col("event_type") === "view" &&
        col("user_id").isNotNull).select(
      col("user_id").as("bucket"),
      col("ts"),
      lit(0).as("tag"),
      lit(null).cast("long").as("p_event_id"),
      ms(col("ts")).as("v_ms"))
    val purchases = e.filter(col("event_type") === "purchase").select(
      col("user_id").as("bucket"),
      col("ts"),
      lit(1).as("tag"),
      col("event_id").as("p_event_id"),
      lit(null).cast("long").as("v_ms"))
    val w = Window.partitionBy("bucket")
      .orderBy(col("ts"), col("tag"), col("v_ms"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    views.unionByName(purchases)
      .withColumn("last_view_ms", last(col("v_ms"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("p_event_id").as("event_id"), col("bucket"),
        col("last_view_ms"))
      .orderBy("event_id")
  }

  private val q13Sql =
    """SELECT p.event_id, p.user_id AS bucket,
      |       (SELECT epoch_ms(max(v.ts)) FROM events v
      |        WHERE v.user_id = p.user_id AND v.event_type = 'view'
      |          AND v.ts <= p.ts) AS last_view_ms
      |FROM events p WHERE p.event_type = 'purchase'
      |ORDER BY event_id""".stripMargin

  /** q14: set operations — intersect/except over the dedup/replay
    * surface (SURVEY §2.2). */
  private def q14(s: SparkSession, d: String): DataFrame = {
    val e = tbl(s, d, "events")
    def ids(t: String) =
      e.filter(col("event_type") === t).select(col("user_id"))
    val both = ids("purchase").intersect(ids("error"))
      .select(lit("purchase_and_error").as("tag"), col("user_id"))
    val only = ids("view").except(ids("signup"))
      .select(lit("view_not_signup").as("tag"), col("user_id"))
    both.unionByName(only).orderBy("tag", "user_id")
  }

  private val q14Sql =
    """SELECT * FROM (
      |  SELECT 'purchase_and_error' AS tag, user_id FROM
      |    (SELECT user_id FROM events WHERE event_type='purchase'
      |     INTERSECT
      |     SELECT user_id FROM events WHERE event_type='error')
      |  UNION ALL
      |  SELECT 'view_not_signup' AS tag, user_id FROM
      |    (SELECT user_id FROM events WHERE event_type='view'
      |     EXCEPT
      |     SELECT user_id FROM events WHERE event_type='signup'))
      |ORDER BY tag, user_id""".stripMargin

  /** q15: top-k per group — window + row_number, fully tie-broken. */
  private def q15(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("value").desc, col("event_id").asc)
    tbl(s, d, "events")
      .select(col("user_id"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .orderBy("user_id", "rn")
  }

  private val q15Sql =
    """SELECT user_id, event_id, value, rn FROM (
      |  SELECT user_id, event_id, value,
      |         CAST(row_number() OVER (PARTITION BY user_id
      |                                 ORDER BY value DESC, event_id ASC) AS BIGINT) AS rn
      |  FROM events)
      |WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin

  /** q16: rollup — multi-level counters per (event_type, user bucket)
    * (reference's per-(market,symbol) counters, storage.py:17-18). */
  private def q16(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "events")
      .withColumn("bucket", (col("user_id") % 10).cast("long"))
      .rollup(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("total"))
      .orderBy(coalesce(col("event_type"), lit("~")),
        coalesce(col("bucket"), lit(-1L)))

  private val q16Sql =
    """SELECT event_type, bucket, count(*) AS n,
      |       CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total
      |FROM (SELECT event_type, CAST(user_id % 10 AS BIGINT) AS bucket, value FROM events)
      |GROUP BY ROLLUP(event_type, bucket)
      |ORDER BY coalesce(event_type, '~'), coalesce(bucket, -1)""".stripMargin

  /** q64: star-schema multiway join (the TPC-H Q5 shape) — revenue per
    * (region, nation) where the supplier serves a customer of its own
    * nation: lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈ nation ⋈
    * region. The 100 TB plan: nation/region are bounded enums —
    * unconditionally broadcast — while customer/supplier are CATALOGS
    * (linear in the platform, the q11/q101/q102 argument), so their
    * broadcasts ride the `T.hintIdSet` fence: broadcast below 2M rows,
    * shuffled hash build above — never an SMJ that would sort the
    * fact side. The ONLY shuffle-scale join is lineitem ⋈ orders on
    * orderkey, and the aggregate on (r_name, n_name) is
    * partial-aggregatable down to a handful of groups. Revenue summed
    * exactly via decimal terms. */
  private def q64(s: SparkSession, d: String): DataFrame = {
    val li = tbl(s, d, "lineitem")
    val o = tbl(s, d, "orders")
    val c = hintIdSet(s, d, "customer", tbl(s, d, "customer"))
    val su = hintIdSet(s, d, "supplier", tbl(s, d, "supplier"))
    val n = tbl(s, d, "nation")
    val r = tbl(s, d, "region")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(su, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  private val q64Sql =
    """SELECT r_name, n_name,
      |       CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
      |         AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue,
      |       count(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q65: pricing summary (the TPC-H Q1 shape) — per (returnflag,
    * linestatus): quantity/price/discounted/charged sums and averages
    * over lineitem. Pure partial-aggregatable scan-aggregate — THE
    * canonical 100 TB query — with every sum decimal-exact and every
    * average a single double division of exactly-agreed values. */
  private def q65(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02")) // pushed to the scan; keeps ~54%
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          (lit(1.0) + col("l_tax")))).cast("double").as("sum_charge"),
        (sum(dec(col("l_quantity"))).cast("double") /
          count(lit(1)).cast("double")).as("avg_qty"),
        (sum(dec(col("l_discount"))).cast("double") /
          count(lit(1)).cast("double")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q65Sql =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
      |       CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
      |       CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_charge,
      |       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_qty,
      |       CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_disc,
      |       count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q101: shipping priority (the TPC-H Q3 shape) — top-10 unshipped
    * orders by discounted revenue for one market segment at a cutoff
    * date. The two-fact-join pattern q64 doesn't cover: orders ⋈
    * lineitem is a genuine big×big equality join (SMJ/shuffle-hash at
    * scale, both sides date-FILTERED AT THE SCAN before the join),
    * while the segment-filtered customer dim broadcasts behind the id
    * fence (T.hintIdSet — customer grows with the platform; shuffled
    * hash build past 2M rows). Top-10 rides
    * TakeOrderedAndProject — no global sort materializes. Revenue is
    * decimal-exact, so the DESC ordering and the tie-break
    * (l_orderkey) agree across engines. */
  private def q101(s: SparkSession, d: String): DataFrame = {
    val cut = "1998-06-30"
    val c = tbl(s, d, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val o = tbl(s, d, "orders")
      .filter(col("o_orderdate") < lit(cut))
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate"), col("o_orderpriority"))
    val li = tbl(s, d, "lineitem")
      .filter(col("l_shipdate") > lit(cut))
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(hintIdSet(s, d, "customer", c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .cast("double").as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        // o_orderdate is TIMESTAMP_NTZ in parquet; the session tz is
        // UTC, so the cast re-tags the same instant DuckDB's epoch_ms
        // assumes.
        ms(col("o_orderdate").cast("timestamp")).as("o_orderdate_ms"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q101Sql =
    """SELECT l_orderkey,
      |       CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
      |         AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue,
      |       epoch_ms(o_orderdate) AS o_orderdate_ms,
      |       o_orderpriority
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-30'
      |  AND l_shipdate > TIMESTAMP '1998-06-30'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** q102: supplier diversity per part attribute (the TPC-H Q16
    * shape): distinct supplier counts per (brand, size), excluding one
    * brand and every supplier on a denylist (negative account balance)
    * — the NOT IN anti-join + count(DISTINCT) pattern. lineitem stands
    * in for partsupp (the driver's schema has no partsupp table): the
    * supplier×part relation is derived from actual shipments.
    *
    * Scale shape: both dims broadcast below the id fence (part onto
    * the fact scan, the ≤suppliers denylist as a broadcast LEFT ANTI;
    * both are catalogs that grow with the platform, so past 2M rows
    * each flips to a shuffled hash build via T.hintIdSet); the
    * distinct-agg shuffles (brand, size, suppkey) partials —
    * corpus-scale data moves once. */
  private def q102(s: SparkSession, d: String): DataFrame = {
    val li = tbl(s, d, "lineitem").select(col("l_partkey"), col("l_suppkey"))
    val p = tbl(s, d, "part")
      .filter(col("p_brand") =!= "Brand#1")
      .select(col("p_partkey"), col("p_brand"),
        col("p_size").cast("long").as("p_size"))
    val deny = tbl(s, d, "supplier")
      .filter(col("s_acctbal") < 0.0).select(col("s_suppkey"))
    li.join(hintIdSet(s, d, "part", p), col("l_partkey") === col("p_partkey"))
      .join(hintIdSet(s, d, "supplier", deny),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
  }

  private val q102Sql =
    """SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
      |       count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1'
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2
      |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q101_ship_priority" -> q101 _,
    "q102_supplier_diversity" -> q102 _,
    "q64_star_join_revenue" -> q64 _,
    "q65_pricing_summary" -> q65 _,
    "q01_project_rename" -> q01 _,
    "q02_filter_eventtype" -> q02 _,
    "q03_conditional_side" -> q03 _,
    "q04_explode_levels" -> q04 _,
    "q05_union_sides" -> q05 _,
    "q06_orderby" -> q06 _,
    "q07_gap_detect" -> q07 _,
    "q08_stale_filter_antijoin" -> q08 _,
    "q09_batch_count" -> q09 _,
    "q10_equijoin_enrich" -> q10 _,
    "q11_broadcast_dim" -> q11 _,
    "q12_semijoin" -> q12 _,
    "q13_range_asof" -> q13 _,
    "q14_set_ops" -> q14 _,
    "q15_topk_window" -> q15 _,
    "q16_rollup_stats" -> q16 _)

  val oracles: Map[String, String] = Map(
    "q101_ship_priority" -> q101Sql,
    "q102_supplier_diversity" -> q102Sql,
    "q64_star_join_revenue" -> q64Sql,
    "q65_pricing_summary" -> q65Sql,
    "q01_project_rename" -> q01Sql,
    "q02_filter_eventtype" -> q02Sql,
    "q03_conditional_side" -> q03Sql,
    "q04_explode_levels" -> q04Sql,
    "q05_union_sides" -> q05Sql,
    "q06_orderby" -> q06Sql,
    "q07_gap_detect" -> q07Sql,
    "q08_stale_filter_antijoin" -> q08Sql,
    "q09_batch_count" -> q09Sql,
    "q10_equijoin_enrich" -> q10Sql,
    "q11_broadcast_dim" -> q11Sql,
    "q12_semijoin" -> q12Sql,
    "q13_range_asof" -> q13Sql,
    "q14_set_ops" -> q14Sql,
    "q15_topk_window" -> q15Sql,
    "q16_rollup_stats" -> q16Sql)
}
