package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** s15: watermarked stream-stream inner join — the conversion join a
  * behavioral pipeline runs online: each click pairs with every
  * purchase by the SAME user within `windowMs` after it.
  *
  * Scale posture: Spark keeps both sides' unmatched rows in keyed
  * state, hash-partitioned by the join key (user), and the PAIR of
  * watermarks plus the two-sided time-range condition lets the engine
  * evict state once rows age past `watermark + windowMs` — state is
  * bounded by (arrival rate × window), not stream history. Without
  * the time bound an inner stream-stream join would buffer forever;
  * this operator makes the bound part of its signature.
  *
  * Event time rides in as exact epoch-millis (`ts_ms`) and the emitted
  * `delay_ms` is integer subtraction — no timestamp arithmetic to
  * disagree with a batch twin (the spec asserts stream results equal
  * the identical batch join).
  */
object StreamingJoin {

  /** `clicks`/`purchases`: streaming frames with (user_id, event_id,
    * ts_ms). Emits (user_id, click_id, purchase_id, delay_ms). */
  def conversions(clicks: DataFrame, purchases: DataFrame,
      windowMs: Long, watermarkDelay: String = "1 minute"): DataFrame = {
    val c = clicks
      .withColumn("click_t", timestamp_millis(col("ts_ms")))
      .withWatermark("click_t", watermarkDelay)
      .select(col("user_id"), col("event_id").as("click_id"),
        col("click_t"), col("ts_ms").as("click_ms"))
    val p = purchases
      .withColumn("purchase_t", timestamp_millis(col("ts_ms")))
      .withWatermark("purchase_t", watermarkDelay)
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("purchase_t"), col("ts_ms").as("purchase_ms"))
    c.join(p,
        col("user_id") === col("p_user") &&
          col("purchase_t") >= col("click_t") &&
          col("purchase_t") <= col("click_t") +
            expr(s"INTERVAL $windowMs MILLISECONDS"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (col("purchase_ms") - col("click_ms")).as("delay_ms"))
  }
}
