package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.ops.Resample.interpolateHourly]] (W3/F8,
  * the reference's one genuine composite — `clean_data.ipynb` cells
  * 5+8): online time-series regularization. The batch op reindexes
  * each symbol to a dense hourly grid, linear-interpolating price
  * between the nearest observed buckets and forward-filling the trade
  * count; this twin emits that grid INCREMENTALLY as the tape arrives.
  *
  * Causality forces the one structural difference (the [[VpinStream]]/
  * [[DepthStream]] precedent): an interior gap's value depends on the
  * NEXT observation, and an observed bucket's value (last trade by
  * event_id) is only final when the bucket closes. The twin therefore
  * emits CUMULATIVE per-key snapshots, keyed `(symbol, bucket)`:
  *  - on every micro-batch that touches a symbol's OPEN bucket, the
  *    open bucket's row and the gap rows between the previous closed
  *    observation and it are (re-)emitted provisionally;
  *  - when a trade OPENS a later bucket, the prior bucket closes and
  *    its segment (gaps + the observed row) is emitted one final time.
  * Per key, emissions are stamped with a per-symbol monotone `ver`, so
  * "latest per key" under the idempotent [[graft.sinks.Upsert]] sink
  * (or a max-`ver` view) converges to exactly the batch grid once the
  * tape drains — the batch-agreement spec checks this bit-exactly,
  * including the double arithmetic: the blend replays the batch
  * expression `pv + (nv - pv) * ((b - pt) / (nt - pt))` on the same
  * epoch-second doubles in the same order.
  *
  * Grid semantics inherited from batch: the grid starts at a symbol's
  * first observed bucket (no leading-null rows exist at symbol grain)
  * and ends at its last — the not-yet-closed tail is simply the open
  * bucket's provisional row. Late trades whose bucket already CLOSED
  * are dropped (watermark-close semantics — the streaming-native
  * analogue of the batch total order); in-order tapes converge
  * bit-exactly, cross-batch disorder is the standard stateful-twin
  * caveat. State is 7 scalars per symbol — O(|symbols|), the smallest
  * state class of any twin here. Emission cardinality per batch is
  * the touched segment (the actual gap length), and totals exactly
  * the dense grid the batch op also materializes. */
object ResampleStream {

  case class Trade(event_id: Long, symbol: String, ts: java.sql.Timestamp,
      price: Double, volume: Double)

  /** One grid row. `ver` is the per-symbol monotone emission stamp —
    * "latest per (symbol, bucket)" = max ver. */
  case class GridRow(symbol: String, bucket: java.sql.Timestamp,
      price_filled: Double, n_trades_ff: Long, ver: Long)

  /** prevBucket/curBucket are bucket-start epoch millis;
    * Long.MinValue = cold. curEid tracks the max event_id seen in the
    * open bucket (the batch `max_by(price, event_id)` representative,
    * robust to in-bucket disorder). */
  case class RState(prevBucket: Long, prevPrice: Double, prevN: Long,
      curBucket: Long, curEid: Long, curPrice: Double, curN: Long,
      ver: Long)

  private val HourMs = 3600000L

  def resampleStream(spark: SparkSession, ds: Dataset[Trade])
      : Dataset[GridRow] = {
    import spark.implicits._
    ds.groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (sym: String, trades: Iterator[Trade], state: GroupState[RState]) =>
          var st = state.getOption.getOrElse(
            RState(Long.MinValue, 0d, 0L, Long.MinValue, Long.MinValue, 0d, 0L, 0L))
          st = st.copy(ver = st.ver + 1L)
          // (symbol, bucketMs) -> row; LinkedHashMap so finals emitted on
          // a transition are later overwritten only by this batch's own
          // re-touches (same ver — identical values, either row is fine)
          val out = scala.collection.mutable.LinkedHashMap.empty[Long, GridRow]
          def micros(t: java.sql.Timestamp): Long =
            t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
          // the batch blend on epoch-SECOND doubles, same op order
          def emitSegment(): Unit = {
            if (st.curBucket == Long.MinValue) return
            if (st.prevBucket != Long.MinValue) {
              val pt = (st.prevBucket / 1000L).toDouble
              val nt = (st.curBucket / 1000L).toDouble
              var b = st.prevBucket + HourMs
              while (b < st.curBucket) {
                val frac = ((b / 1000L).toDouble - pt) / (nt - pt)
                out(b) = GridRow(sym, new java.sql.Timestamp(b),
                  st.prevPrice + (st.curPrice - st.prevPrice) * frac,
                  st.prevN, st.ver)
                b += HourMs
              }
            }
            out(st.curBucket) = GridRow(sym,
              new java.sql.Timestamp(st.curBucket), st.curPrice, st.curN,
              st.ver)
          }
          var touched = false
          trades.toSeq.sortBy(t => (micros(t.ts), t.event_id)).foreach { t =>
            val b = Math.floorDiv(t.ts.getTime, HourMs) * HourMs
            if (st.curBucket == Long.MinValue || b == st.curBucket) {
              // open (or keep filling) the current bucket
              val repl = st.curBucket == Long.MinValue || t.event_id > st.curEid
              st = st.copy(curBucket = b,
                curEid = if (repl) t.event_id else st.curEid,
                curPrice = if (repl) t.price else st.curPrice,
                curN = Math.addExact(st.curN, 1L))
              touched = true
            } else if (b > st.curBucket) {
              // the open bucket closes: its segment is final
              emitSegment()
              st = st.copy(prevBucket = st.curBucket, prevPrice = st.curPrice,
                prevN = st.curN, curBucket = b, curEid = t.event_id,
                curPrice = t.price, curN = 1L)
              touched = true
            }
            // else b < curBucket: the bucket already closed — dropped
            // (watermark-close semantics, see scaladoc)
          }
          if (touched) emitSegment()
          state.update(st)
          out.valuesIterator.toList.iterator
      }
  }
}
