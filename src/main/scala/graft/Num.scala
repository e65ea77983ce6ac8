package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** Shared exact-money numeric discipline (SURVEY.md §7.4).
  *
  * Money inputs carry ≤ 6 decimals, so `decimal(18,6)` casts are
  * lossless and decimal sums are order-independent — the base rule
  * every money aggregate in the engine follows.
  *
  * The OUTPUT cast back to double is where engines diverge: Spark's
  * DECIMAL→DOUBLE is correctly rounded (BigDecimal.doubleValue), while
  * DuckDB double-rounds through the int128 unscaled value and its
  * scale divisor — 1-ulp divergence once the unscaled value exceeds
  * 2⁵³ (≈ 9.007·10⁹ money units at micro scale; caught live by the
  * r13 sf1 sweep on q1's `sum_charge` = 2.8·10¹⁰). [[decD]] routes the
  * cast through the exact micro-unit BIGINT so BOTH engines perform
  * the SAME single IEEE int64→double rounding:
  *
  *   decimal → ×10⁶ (exact integer, no precision lost)
  *           → BIGINT → one IEEE cast → ÷10⁶ (exact power-of-ten
  *             double division, bit-identical in both engines)
  *
  * Ceiling: |aggregate| must stay ≤ 2⁶³−1 micro-units ≈ 9.22·10¹²
  * money units. Past it this fails LOUDLY on both sides — the inline
  * `assert_true` here, DuckDB's native BIGINT-overflow raise in the
  * mirrored `CAST(CAST(x * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0`
  * oracle form — never silently (an unguarded Spark decimal→long cast
  * would return NULL). Aggregates that can exceed the ceiling by
  * construction (e.g. [[graft.ops.TradeOps.twap]]'s Σ price·µs, which
  * is day-bounded but µs-scaled) must NOT use decD; they document
  * their own determinism argument instead.
  */
object Num {

  /** Exact decimal cast for ≤6-dp money inputs. */
  def dec(c: Column): Column = c.cast("decimal(18,6)")

  /** Deterministic DECIMAL→DOUBLE for money aggregates — see the
    * object scaladoc for the full cross-engine argument. Null-safe
    * (null aggregate → null output); loud past ±9.22·10¹² units. */
  def decD(c: Column): Column = {
    val guard = assert_true(
      c.isNull || abs(c) <= lit(9223372036854775807L / 1000000L),
      lit("decD: money aggregate exceeds the exact micro-BIGINT range " +
        "(|x| > 9.22e12 units) — widen the quantum or use DECIMAL(38,0)"))
    when(guard.isNull, (c * lit(1000000)).cast("long")).cast("double") /
      lit(1000000d)
  }

  /** Exact micro-unit LONG for a single ≤6-dp money value — the
    * quantization [[decD]] applies to an aggregate, moved to the INPUT
    * row so frames can sum cheap longs (see [[decDWin]]). A single row
    * is within the micro-BIGINT range by the §7.4 input-fidelity bound
    * (|v| ≲ 5e8); past it the ANSI decimal→long cast raises. */
  def micros(c: Column): Column =
    (c.cast("decimal(18,6)") * lit(1000000)).cast("long")

  /** Deterministic WINDOWED money sum — the [[decD]] contract at
    * long-add cost. Quantize each input row once (exact), sum LONGs
    * over the frame, one IEEE long→double cast + exact power-of-ten
    * divide at emit: Σ micros(xᵢ) = 10⁶·Σ xᵢ exactly, so the value is
    * bit-identical to `decD(sum(dec(c)).over(w))` and to the mirrored
    * `CAST(CAST(sum(DECIMAL) OVER w × 10⁶ AS BIGINT) AS DOUBLE)/10⁶`
    * oracle — no oracle change when swapping forms. What changes is
    * per-output-row cost: the decimal form paid O(frame) BigDecimal
    * adds plus a guard + two casts + divide PER ROW (the r13 floor
    * measured the lookback family 1.6–1.7× slower for it); this form
    * pays O(frame) long adds and one cast. The ceiling stays LOUD on
    * both sides — Spark's ANSI long-sum overflow raises past 2⁶³
    * micro-units (EdgeCasesSpec pins it), DuckDB's BIGINT cast of the
    * widened decimal raises identically. */
  def decDWin(c: Column, w: WindowSpec): Column =
    sum(micros(c)).over(w).cast("double") / lit(1000000d)
}
