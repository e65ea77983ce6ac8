package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.ops.TradeOps.depthLadder]]: the live
  * price-level volume ladder — a depth display updates per TRADE, and
  * the reference lineage is the same per-trade callback every online
  * twin here models (`FinnhubProducer.py:32-40`).
  *
  * One difference from the batch op is forced by causality, the
  * [[VpinStream]] volume-clock precedent: batch anchors the ladder at
  * the corpus-FINAL last price (±window filter + `rel_cents`), a
  * quantity no online operator can know. The twin therefore maintains
  * and emits the FULL per-level ladder, and the anchor is applied at
  * serving time against the then-current last price — exactly how a
  * depth view works (the book is the state; the display window moves
  * with the touch). The batch-agreement spec applies the batch anchor
  * to the converged store and gets the batch table bit-exactly.
  *
  * Per symbol, `flatMapGroupsWithState` carries the tick-rule memory
  * (last price-cents, carried sign — the [[VpinStream]]/
  * [[KyleStream]] state machine verbatim) plus the level map
  * `pc → (n_trades, buy, sell, neutral micro-volumes)`. Each trade
  * replays the batch op's exact integer algebra: quantize with
  * Spark's own `round(x·10ᵏ)` semantics, resolve the carried sign,
  * add `vm` to the level's bucket for that sign. Emissions are
  * CUMULATIVE snapshots of the levels TOUCHED this batch, keyed
  * `(symbol, pc)` — `n_trades` only grows for a key, so the
  * idempotent [[graft.sinks.Upsert]] sink (or a last-writer view)
  * converges to exactly the batch ladder; replays are no-ops (the
  * K1/K5 envelope).
  *
  * State is the level map: bounded by the distinct CENT LEVELS a
  * symbol ever trades at — the price range, not the tape length
  * (thousands of entries × 4 longs per symbol at worst). A production
  * deployment that must hard-bound it evicts levels far outside the
  * rolling touch (they can be rebuilt from the sink on re-entry);
  * state-size asymmetry vs the 3-long twins is the honest cost of a
  * keyed-output operator and is documented here rather than hidden.
  * Overflow is loud from birth: per-level sums use `addExact` at the
  * same int64 boundary as the batch column's ANSI sums. Within a
  * micro-batch trades sort by (ts, event_id) — the batch total order;
  * cross-batch disorder is the standard stateful-twin caveat. */
object DepthStream {

  case class Trade(event_id: Long, symbol: String, ts: java.sql.Timestamp,
      price: Double, volume: Double)

  /** Cumulative snapshot of one price level. `n_trades` only grows for
    * a given (symbol, pc), so "latest per key" is also "max". */
  case class LevelRow(symbol: String, pc: Long, n_trades: Long,
      buy_vol_micro: Long, sell_vol_micro: Long, neutral_vol_micro: Long)

  /** Per-level accumulators (n, buy, sell, neutral). */
  case class Acc(n: Long, b: Long, s: Long, u: Long)

  /** lastPc uses Long.MinValue as the cold sentinel (no trade seen);
    * sgn 0 until the first price move, then the carried tick rule. */
  case class DepthState(lastPc: Long, sgn: Long, levels: Map[Long, Acc])

  /** Spark SQL `CAST(round(x * mult) AS BIGINT)` parity (the shared
    * twin quantizer). */
  private def q(x: Double, mult: Long): Long =
    java.math.BigDecimal.valueOf(x * mult)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  def depthStream(spark: SparkSession, ds: Dataset[Trade])
      : Dataset[LevelRow] = {
    import spark.implicits._
    ds.groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (sym: String, trades: Iterator[Trade],
            state: GroupState[DepthState]) =>
          var st = state.getOption
            .getOrElse(DepthState(Long.MinValue, 0L, Map.empty))
          val touched = scala.collection.mutable.LinkedHashSet.empty[Long]
          def micros(t: java.sql.Timestamp): Long =
            t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
          trades.toSeq.sortBy(t => (micros(t.ts), t.event_id)).foreach { t =>
            val pc = q(t.price, 100L)
            val vm = q(t.volume, 1000000L)
            val sgn =
              if (st.lastPc == Long.MinValue) st.sgn
              else if (pc > st.lastPc) 1L
              else if (pc < st.lastPc) -1L
              else st.sgn
            val a = st.levels.getOrElse(pc, Acc(0L, 0L, 0L, 0L))
            val a2 = Acc(Math.addExact(a.n, 1L),
              if (sgn == 1L) Math.addExact(a.b, vm) else a.b,
              if (sgn == -1L) Math.addExact(a.s, vm) else a.s,
              if (sgn == 0L) Math.addExact(a.u, vm) else a.u)
            st = DepthState(pc, sgn, st.levels.updated(pc, a2))
            touched += pc
          }
          state.update(st)
          touched.iterator.map { pc =>
            val a = st.levels(pc)
            LevelRow(sym, pc, a.n, a.b, a.s, a.u)
          }
      }
  }
}
