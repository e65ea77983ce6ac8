package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch forms of the reference streaming job's operators (SURVEY.md §2.4,
  * §2.5, §2.7): tumbling/sliding window aggregation, running cumulative
  * sum, fixed-length lookback, min-max scaling, date-part derivation,
  * JSON key/value encoding, and the serving-layer queries.
  *
  * Every aggregate of doubles is rounded to 6 decimals *in the engine* so
  * the DuckDB oracle (which does the same) hash-matches despite
  * summation-order noise (SURVEY.md §7.4). At scale these are all
  * partial+final hash aggregates with a single shuffle on the grouping
  * keys — no driver-side state.
  */
object TradeOps {

  /** A1/A3 (reference `ProcessStockStream.py:112-123`): 1-minute tumbling
    * windows per symbol, total volume + usd volume. */
  def tumblingVolume(trades: DataFrame): DataFrame =
    trades
      .groupBy(window(col("timestamp"), "1 minute"), col("symbol"))
      .agg(
        round(sum(col("volume")), 6).as("total_volume"),
        round(sum(col("usd_volume")), 6).as("total_usd_volume"),
        count(lit(1)).as("n_trades"))
      .select(col("symbol"), col("window.start").as("timestamp"),
        col("total_volume"), col("total_usd_volume"), col("n_trades"))

  /** A2/A4-A6 (reference `ProcessStockStream.py:143-161`): 30s/10s sliding
    * windows, OHLC-style features. The reference's `last(price)` close is
    * arrival-order-dependent (SURVEY.md §7.4); this uses the deterministic
    * `max_by(price, event_id)` variant so results are oracle-comparable.
    * Each event lands in exactly 3 overlapping windows. */
  def slidingFeatures(trades: DataFrame): DataFrame =
    trades
      .groupBy(window(col("timestamp"), "30 seconds", "10 seconds"), col("symbol"))
      .agg(
        round(sum(col("usd_volume")), 6).as("total_usd_volume"),
        round(sum(col("volume")), 6).as("total_volume"),
        max_by(col("price"), col("event_id")).as("close"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        count(col("price")).as("num_trades"))
      .select(col("symbol"), col("window.start").as("timestamp"),
        col("total_usd_volume"), col("total_volume"),
        col("close"), col("high"), col("low"), col("num_trades"))

  /** A7/W1 (reference `FinnhubProducer.py:34-36`): per-symbol running
    * cumulative volume — the producer's stateful dict as a window
    * function. Order is made deterministic with the `event_id` tiebreak. */
  def cumulativeVolume(trades: DataFrame): DataFrame = {
    val w = Window.partitionBy("symbol")
      .orderBy(col("timestamp"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    trades.select(
      col("event_id"), col("symbol"), col("timestamp"), col("volume"),
      round(sum(col("volume")).over(w), 6).as("cumulative_volume"))
  }

  /** W2/T14 (reference `BtcPrediction/kafka.py:42-57`): fixed 100-row
    * sliding lookback per symbol; emit only once the buffer is full
    * (`lookback=100`, drop-oldest). */
  def lookbackAvg(trades: DataFrame, n: Int = 100): DataFrame = {
    val w = Window.partitionBy("symbol")
      .orderBy(col("timestamp"), col("event_id"))
      .rowsBetween(-(n - 1), Window.currentRow)
    trades
      .select(
        col("event_id"), col("symbol"), col("timestamp"),
        round(avg(col("price")).over(w), 6).as("lookback_avg"),
        count(lit(1)).over(w).as("n_rows"))
      .filter(col("n_rows") === n)
  }

  /** F9 (reference `train_model.ipynb` cell 3, `predict_btc.py:40-50`):
    * per-symbol min-max scaling `(x - min) / (max - min)`. The fitted
    * stats are a tiny aggregate — broadcast back, no second shuffle. */
  def minMaxScale(trades: DataFrame): DataFrame = {
    val stats = trades.groupBy("symbol")
      .agg(min(col("price")).as("mn"), max(col("price")).as("mx"))
    trades.join(broadcast(stats), Seq("symbol"))
      .select(
        col("event_id"), col("symbol"), col("price"),
        round((col("price") - col("mn")) / (col("mx") - col("mn")), 6)
          .as("scaled"))
  }

  /** F3 (reference `ProcessStockStream.py:181-184`): derive the file-sink
    * partition columns year/month/day/hour and roll up per partition —
    * the partition-pruning layout of the CSV sink (K4). */
  def dateParts(trades: DataFrame): DataFrame =
    trades
      .select(
        year(col("timestamp")).as("year"),
        month(col("timestamp")).as("month"),
        dayofmonth(col("timestamp")).as("day"),
        hour(col("timestamp")).as("hour"),
        col("volume"))
      .groupBy("year", "month", "day", "hour")
      .agg(count(lit(1)).as("n"), round(sum(col("volume")), 6).as("total_volume"))

  /** F2/P9 (reference `ProcessStockStream.py:163-172`): per-minute bars
    * serialized as Kafka key/value — `key = symbol`,
    * `value = to_json(named_struct(...))`. */
  def jsonKeyValue(trades: DataFrame): DataFrame =
    tumblingVolume(trades)
      .selectExpr(
        "symbol AS key",
        "to_json(named_struct(" +
          "'symbol', symbol, " +
          "'minute_start', CAST(timestamp AS STRING), " +
          "'n_trades', n_trades)) AS value")

  /** S6/P11/O1 (reference `grafana/dashboard.json` panels): per-symbol
    * time-range serving query. Filter + projection push down to the
    * parquet scan. */
  def servingRange(trades: DataFrame, symbol: String, lo: String, hi: String): DataFrame =
    trades
      .filter(col("symbol") === symbol &&
        col("timestamp").between(lit(lo).cast("timestamp"), lit(hi).cast("timestamp")))
      .select(col("event_id"), col("timestamp"), col("price"))

  /** O2 (reference `predict_btc.py:83,88`): last row per key via `max_by`
    * — no global sort, a single aggregate. */
  def lastRow(trades: DataFrame): DataFrame =
    trades.groupBy("symbol").agg(
      max_by(col("price"), col("event_id")).as("last_price"),
      max(col("timestamp")).as("last_ts"))

  /** O4 (reference `train_model.ipynb` cell 4): deterministic 80/20
    * order-based train/test split — row_number over event time, NOT
    * randomSplit. (Global window: acceptable for the ML-prep path where
    * the reference collects to one node anyway; not a hot-path operator.) */
  def orderedSplit(trades: DataFrame, trainFrac: Double = 0.8): DataFrame = {
    val n = trades.count()
    val threshold = math.floor(n * trainFrac).toLong
    trades
      .select(col("event_id"), col("symbol"), col("timestamp"),
        row_number().over(
          Window.orderBy(col("timestamp"), col("event_id"))).as("rn"))
      .withColumn("split",
        when(col("rn") <= threshold, lit("train")).otherwise(lit("test")))
      .select("event_id", "symbol", "split")
  }
}
