package graft

import org.apache.spark.sql.types.TimestampType

/** Pins the `T.tbl` normalization invariant: whatever physical parquet
  * encoding the driver last wrote (TIMESTAMP(NANOS) read as
  * nanos-long, or TIMESTAMP_NTZ from a µs/isAdjustedToUTC=false file),
  * every loaded timestamp column must surface as a plain UTC
  * TimestampType so `unix_millis`/`window`/frame call sites stay
  * encoding-agnostic. A driver-side testdata re-encoding broke 11
  * queries in round 7; these specs make the next one fail loudly in
  * one obvious place, naming the exact table/column that moved. */
class TsSchemaSpec extends SparkSpec {

  /** Golden post-normalization schema of every driver table —
    * (column, Spark simpleString) in file order. */
  private val golden: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp"),
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp",
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int"))

  test("every testdata table loads with the golden normalized schema") {
    golden.foreach { case (name, want) =>
      val got = T.tbl(spark, sfDir, name).schema
        .map(f => f.name -> f.dataType.simpleString)
      assert(got == want,
        s"$name schema drifted (driver re-encoding?).\n  got:  $got\n  want: $want")
    }
  }

  test("no table surfaces a TIMESTAMP_NTZ or raw-long timestamp column") {
    golden.keys.foreach { name =>
      val bad = T.tbl(spark, sfDir, name).schema.filter(f =>
        f.dataType == org.apache.spark.sql.types.TimestampNTZType ||
          (f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType))
      assert(bad.isEmpty,
        s"$name: un-normalized timestamp columns ${bad.map(_.name)}")
    }
  }

  test("normalized ts carries correct epoch millis (UTC instant parity)") {
    val ev = T.tbl(spark, sfDir, "events")
    assert(ev.schema.find(_.name == "ts").get.dataType == TimestampType)
    val r = ev.selectExpr("min(unix_millis(ts)) AS lo", "max(unix_millis(ts)) AS hi")
      .collect()(0)
    val lo = r.getLong(0)
    val hi = r.getLong(1)
    // Driver data is generated in a sane modern range; a wrong-zone or
    // wrong-unit interpretation lands decades away or out of order.
    assert(lo > 946684800000L, s"min epoch-ms $lo predates 2000-01-01")
    assert(hi < 4102444800000L, s"max epoch-ms $hi is past 2100-01-01")
    assert(lo <= hi)
  }
}
