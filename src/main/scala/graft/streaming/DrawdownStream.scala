package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.ops.TradeOps.maxDrawdown]]: online
  * peak-to-trough path risk, completing the online risk tier next to
  * [[VpinStream]] (flow toxicity) and [[KyleStream]] (price impact) —
  * a desk watches its live drawdown per symbol tick by tick, not in
  * the nightly batch; the reference lineage is the same per-trade
  * callback (`FinnhubProducer.py:32-40`).
  *
  * Per symbol, `flatMapGroupsWithState` carries four values: running
  * peak cents, max drawdown cents, tick count, and the running max of
  * the per-tick drawdown FRACTION. Each trade replays the batch op's
  * exact algebra: `pc` quantized with Spark's own `round(x·10²)`
  * semantics (the shared [[VpinStream]] quantizer), `peak = max(peak,
  * pc)` and `dd = peak − pc` in exact longs, and — when the peak is
  * positive — ONE correctly-rounded IEEE division `dd/peak` whose
  * running max is order-free, so the twin's fraction is bit-exact
  * against the batch table by construction (the batch-agreement spec
  * asserts both columns). No overflow surface exists past the
  * quantizer: `dd ≤ peak − min_pc` stays in int64 wherever `pc` does.
  *
  * Emissions are per-symbol CUMULATIVE snapshots keyed by `symbol`
  * (`n_ticks` only grows), so the idempotent [[graft.sinks.Upsert]]
  * sink converges to exactly the batch table; replays and
  * re-emissions are no-ops (the K1/K5 envelope). State is 3 longs + 1
  * double (~32 B) per symbol — bounded by symbol cardinality, never
  * the tape — and survives restarts in the state store, so the first
  * trade after recovery continues the same peak. Within a micro-batch
  * trades sort by (ts, event_id) — the batch op's total order;
  * cross-batch disorder is the standard stateful-twin caveat. */
object DrawdownStream {

  case class Trade(event_id: Long, symbol: String, ts: java.sql.Timestamp,
      price: Double, volume: Double)

  /** Cumulative snapshot of one symbol's running drawdown. `n_ticks`
    * only grows per symbol, so "latest" is also "max". */
  case class DdRow(symbol: String, n_ticks: Long, max_dd_cents: Long,
      max_dd_frac: Option[Double])

  /** maxFrac uses −1.0 as the "no positive peak seen yet" sentinel —
    * real fractions are always ≥ 0. */
  case class DdState(peak: Long, maxDd: Long, n: Long, maxFrac: Double)

  /** Spark SQL `CAST(round(x * mult) AS BIGINT)` parity (the shared
    * twin quantizer): BigDecimal.valueOf shortest-string + HALF_UP,
    * loud past int64. */
  private def q(x: Double, mult: Long): Long =
    java.math.BigDecimal.valueOf(x * mult)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  def drawdownStream(spark: SparkSession, ds: Dataset[Trade])
      : Dataset[DdRow] = {
    import spark.implicits._
    ds.groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (sym: String, trades: Iterator[Trade],
            state: GroupState[DdState]) =>
          var st = state.getOption
            .getOrElse(DdState(Long.MinValue, 0L, 0L, -1.0d))
          def micros(t: java.sql.Timestamp): Long =
            t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
          trades.toSeq.sortBy(t => (micros(t.ts), t.event_id)).foreach { t =>
            val pc = q(t.price, 100L)
            val peak = math.max(st.peak, pc)
            val dd = Math.subtractExact(peak, pc)
            val frac =
              if (peak > 0L) math.max(st.maxFrac, dd.toDouble / peak.toDouble)
              else st.maxFrac
            st = DdState(peak, math.max(st.maxDd, dd),
              Math.addExact(st.n, 1L), frac)
          }
          state.update(st)
          if (st.n > 0L)
            Iterator.single(DdRow(sym, st.n, st.maxDd,
              if (st.maxFrac >= 0.0d) Some(st.maxFrac) else None))
          else Iterator.empty
      }
  }
}
