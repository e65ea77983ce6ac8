package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins (SURVEY.md §2.8 breadth beyond the reference's
  * single-stream DAG): the streaming form of the batch
  * [[graft.ops.AsOfJoin.rangeCountJoin]] enrichment — purchases joined
  * to the clicks that preceded them within a bounded interval.
  *
  * Scale posture: BOTH sides carry watermarks and the join condition
  * bounds event-time distance, so Spark's streaming join can evict
  * buffered rows once the watermark passes `ts + window` — state is
  * bounded by (watermark horizon + interval) × arrival rate, never the
  * full history. An unbounded-condition stream-stream join would grow
  * state forever; this is the only join shape that survives an
  * always-on pipeline.
  */
object StreamJoins {

  /** Enrich each purchase with the clicks by the same user in
    * `(purchase_ts − windowSec, purchase_ts]`. Inner join: purchases
    * with no preceding click emit nothing (the left-outer variant would
    * additionally emit null-click rows once the watermark proves no
    * match can arrive). */
  def purchasesWithRecentClicks(purchases: DataFrame, clicks: DataFrame,
      windowSec: Long = 3600, watermark: String = "30 seconds"): DataFrame = {
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("price").as("purchase_price"))
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("click_user"), col("ts").as("click_ts"))
    p.join(c,
      col("user_id") === col("click_user") &&
        col("click_ts") > col("purchase_ts") - expr(s"INTERVAL $windowSec SECONDS") &&
        col("click_ts") <= col("purchase_ts"))
      .select(col("user_id"), col("purchase_ts"), col("purchase_price"),
        col("click_ts"))
  }

  /** Stream–static enrichment: the streaming trade feed joined to a
    * small static dimension (symbol → metadata) — the most common
    * streaming join in practice (reference analog: attaching instrument
    * metadata before the dashboard write).
    *
    * Scale posture: the static side is `broadcast()` explicitly, so
    * every micro-batch is a map-side hash join — NO state store, no
    * watermark needed (stream-static joins are stateless by
    * definition), no shuffle of the stream. A left join keeps
    * unenriched ticks flowing (inner would silently drop symbols
    * missing from the dimension — at 100 TB that is data loss, not
    * enrichment). */
  def enrichWithDimension(stream: DataFrame, dim: DataFrame): DataFrame =
    stream.join(broadcast(dim), Seq("symbol"), "left")
}
