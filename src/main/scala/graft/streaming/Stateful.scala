package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Custom streaming state (SURVEY.md §2.8 T13/T14) via
  * `flatMapGroupsWithState` — the stable stateful API (preferred over
  * `transformWithState` for portability, SURVEY.md §7.4).
  *
  * State is per-key and checkpointed by the state store, which *improves*
  * on the reference: the producer's cumulative-volume dict resets on
  * restart (`FinnhubProducer.py:20-22`), ours survives.
  */
object Stateful {

  case class TradeEvent(symbol: String, ts: java.sql.Timestamp,
      price: Double, volume: Double)

  case class CumRow(symbol: String, ts: java.sql.Timestamp,
      volume: Double, cumulative_volume: Double)

  /** T13 (reference `FinnhubProducer.py:34-36`): per-symbol running
    * cumulative volume. Within a micro-batch, events are ordered by
    * (ts) for determinism; across batches the running total lives in
    * `GroupState[Double]`. */
  def cumulativeVolume(spark: SparkSession, ds: Dataset[TradeEvent]): Dataset[CumRow] = {
    import spark.implicits._
    ds.groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (symbol: String, events: Iterator[TradeEvent], state: GroupState[Double]) =>
          var total = state.getOption.getOrElse(0.0)
          val out = events.toSeq.sortBy(_.ts.getTime).map { e =>
            total += e.volume
            CumRow(symbol, e.ts, e.volume, total)
          }
          state.update(total)
          out.iterator
      }
  }

  /** T13 again on Spark 4's `transformWithState` (the arbitrary-state
    * API that supersedes `flatMapGroupsWithState`): same per-symbol
    * running total, held in a named `ValueState[Double]`. Requires the
    * RocksDB state-store provider
    * (`spark.sql.streaming.stateStore.providerClass`), which ships with
    * the distribution. Kept alongside the fMGWS form — one op, both
    * stateful APIs, so either generation of runtime is covered. */
  class CumulativeVolumeProcessor
      extends StatefulProcessor[String, TradeEvent, CumRow] {
    @transient private var total: org.apache.spark.sql.streaming.ValueState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      total = getHandle.getValueState[Double](
        "total", Encoders.scalaDouble, TTLConfig.NONE)

    override def handleInputRows(symbol: String, rows: Iterator[TradeEvent],
        timerValues: TimerValues): Iterator[CumRow] = {
      var t = if (total.exists()) total.get() else 0.0
      val out = rows.toSeq.sortBy(_.ts.getTime).map { e =>
        t += e.volume
        CumRow(symbol, e.ts, e.volume, t)
      }
      total.update(t)
      out.iterator
    }
  }

  def cumulativeVolumeTws(spark: SparkSession,
      ds: Dataset[TradeEvent]): Dataset[CumRow] = {
    import spark.implicits._
    ds.groupByKey(_.symbol)
      .transformWithState(new CumulativeVolumeProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Streaming exact dedup with bounded state: duplicates arriving
    * within the watermark horizon are dropped, and the dedup state is
    * evicted once the watermark passes — the streaming form of the
    * batch `exactDedup`, sized for unbounded streams (plain
    * `dropDuplicates` would grow state forever). */
  def dedupWithinWatermark(ds: Dataset[TradeEvent],
      horizon: String = "30 seconds"): Dataset[TradeEvent] =
    ds.withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("symbol", "ts")

  case class LookbackRow(symbol: String, ts: java.sql.Timestamp,
      n: Int, avg_price: Double)

  /** T14 (reference `BtcPrediction/kafka.py:42-57`): fixed-length
    * sliding buffer — keep the last `n` rows per key, drop-oldest, and
    * emit only once the buffer is full (the consumer's `lookback=100`
    * gate before LSTM inference). */
  def lookbackBuffer(spark: SparkSession, ds: Dataset[TradeEvent],
      n: Int = 100): Dataset[LookbackRow] = {
    import spark.implicits._
    ds.groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (symbol: String, events: Iterator[TradeEvent], state: GroupState[List[Double]]) =>
          var buf = state.getOption.getOrElse(List.empty[Double])
          val out = events.toSeq.sortBy(_.ts.getTime).flatMap { e =>
            buf = (buf :+ e.price).takeRight(n) // drop-oldest (kafka.py:55-57)
            if (buf.length == n)
              Some(LookbackRow(symbol, e.ts, n, buf.sum / n))
            else None
          }
          state.update(buf)
          out.iterator
      }
  }
}
