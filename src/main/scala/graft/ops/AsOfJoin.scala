package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the temporal association the reference
  * performs implicitly when it aligns a prediction at t+10s with the
  * actual at t (`BtcPrediction/predict_btc.py:88-91`; SURVEY.md §2.6).
  *
  * Spark lacks a native as-of join. Rather than a range-exploding theta
  * join (quadratic per key), this uses the scalable union-sort trick:
  * tag both sides, union, sort within key partitions by (time, side), and
  * carry the last right-side payload forward with a window function.
  * Cost: ONE shuffle of left+right on the key — the same plan shape a
  * sort-merge join would use, so it survives a 100-TB scale-up; skewed
  * keys are handled by AQE like any other sort/window.
  */
object AsOfJoin {

  /** For each left row, attach the payload of the latest right row with
    * the same `key` and `rightTs <= leftTs` (ties at equal timestamps:
    * right row wins, matching `ON r.t <= l.t` backward as-of semantics).
    *
    * `left` must contain `key` and `ts`; `right` must contain `key`,
    * `ts`, and `payload`. Right side should be unique per (key, ts) —
    * pre-aggregate otherwise.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: String, as: String): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("_side", lit(1))
      .withColumn("_pay", lit(null).cast(right.schema(payload).dataType))
    val r = right
      .select(col(key), col(ts), col(payload).as("_pay"))
      .withColumn("_side", lit(0))

    val unioned = l.select(
      (leftCols.map(col) :+ col("_side") :+ col("_pay")): _*
    ).unionByName(
      r.select(
        (leftCols.map(c => if (c == key || c == ts) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c))
          :+ col("_side") :+ col("_pay")): _*))

    // Rows at the same (key, ts): right (_side=0) sorts first, so the
    // left row sees it. last(ignoreNulls) carries the payload forward.
    val w = Window.partitionBy(key)
      .orderBy(col(ts), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(as, last(col("_pay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side", "_pay")
  }

  /** Backward as-of with a STALENESS TOLERANCE — the serving-layer
    * variant of [[asOf]]: a match older than `toleranceMs` is REJECTED
    * (payload and staleness both NULL), the "don't enrich with a quote
    * from last Tuesday" rule every feature-store point-in-time join
    * ships with. Same one-shuffle union-sort plan; the matched right
    * timestamp rides the carried struct so staleness is computable
    * without a second join. Staleness is the exact non-negative
    * epoch-micro difference floor-divided to ms (backward match ⇒
    * `leftTs ≥ rightTs`, so floor vs truncate cannot differ). */
  def asOfTolerance(left: DataFrame, right: DataFrame, key: String,
      ts: String, payload: String, as: String,
      toleranceMs: Long): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("_side", lit(1))
      .withColumn("_pay", lit(null).cast(right.schema(payload).dataType))
    val r = right
      .select(col(key), col(ts), col(payload).as("_pay"))
      .withColumn("_side", lit(0))
    val unioned = l.select(
      (leftCols.map(col) :+ col("_side") :+ col("_pay")): _*
    ).unionByName(
      r.select(
        (leftCols.map(c => if (c == key || c == ts) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c))
          :+ col("_side") :+ col("_pay")): _*))
    val w = Window.partitionBy(key)
      .orderBy(col(ts), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // one carried struct keeps payload and match-timestamp in lockstep
    // (two separate last(ignoreNulls) could desync on a null payload)
    unioned
      .withColumn("_m", last(
        when(col("_side") === 0, struct(col("_pay").as("p"),
          col(ts).as("rts"))), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .withColumn("_stale_ms",
        expr(s"(unix_micros($ts) - unix_micros(_m.rts)) div 1000"))
      .withColumn(as,
        when(col("_stale_ms") <= toleranceMs, col("_m.p")))
      .withColumn("staleness_ms",
        when(col("_stale_ms") <= toleranceMs, col("_stale_ms")))
      .select((leftCols.map(col) :+ col(as) :+ col("staleness_ms")): _*)
  }

  /** Forward as-of: for each left row, attach the payload of the
    * EARLIEST right row with the same `key` and `rightTs >= leftTs`
    * (ties match — the "next quote at or after the order" association;
    * complement of [[asOf]]'s backward direction). Same union-sort
    * plan, mirrored: left rows sort BEFORE a same-timestamp right row,
    * and `first(ignoreNulls)` over the FOLLOWING frame pulls the next
    * payload back. Still exactly one shuffle of left+right on the
    * key. */
  def asOfForward(left: DataFrame, right: DataFrame, key: String,
      ts: String, payload: String, as: String): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("_side", lit(0))
      .withColumn("_pay", lit(null).cast(right.schema(payload).dataType))
    val r = right
      .select(col(key), col(ts), col(payload).as("_pay"))
      .withColumn("_side", lit(1))

    val unioned = l.select(
      (leftCols.map(col) :+ col("_side") :+ col("_pay")): _*
    ).unionByName(
      r.select(
        (leftCols.map(c => if (c == key || c == ts) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c))
          :+ col("_side") :+ col("_pay")): _*))

    // "first following (inclusive)" as "last preceding (inclusive)"
    // over the REVERSED sort: identical row set, but the running
    // (unboundedPreceding, currentRow) frame evaluates incrementally
    // in O(n) where the moving-lower-bound unbounded-following frame
    // re-scans the tail per row — measured live as a ~30-minute
    // single-task grind on the r17 dense stress corpus (long
    // left-row runs between right rows are exactly the bad case).
    val w = Window.partitionBy(key)
      .orderBy(col(ts).desc, col("_side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(as, last(col("_pay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
      .drop("_side", "_pay")
  }

  /** Nearest as-of: for each left row, attach the payload of the right
    * row with the same `key` whose timestamp is CLOSEST in either
    * direction — the sensor-alignment / nearest-quote association
    * ([[asOf]] backward and [[asOfForward]] forward are the one-sided
    * halves; ties at equal distance go backward, and an equal-timestamp
    * right row is a zero-delta backward match). Emits the signed
    * `delta_ms` (`rightTs − leftTs`, ≤ 0 backward) alongside the
    * payload.
    *
    * Plan: ONE union-sort (the [[asOf]] shape) carries BOTH directions
    * — the backward candidate via `last(ignoreNulls)` over the
    * preceding frame and the forward candidate via `first(ignoreNulls)`
    * over the following frame of the same (key, ts, side) order — so
    * nearest costs exactly what one-sided as-of costs: a single
    * shuffle of left+right on the key, no inequality join anywhere.
    * Deltas are exact epoch-micro BIGINTs; the millisecond display
    * value divides the non-negative magnitude first and negates after
    * (signed floor-vs-truncate division differs across engines;
    * non-negative division does not). */
  def asOfNearest(left: DataFrame, right: DataFrame, key: String,
      ts: String, payload: String, as: String): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("_side", lit(1))
      .withColumn("_pay", lit(null).cast(right.schema(payload).dataType))
    val r = right
      .select(col(key), col(ts), col(payload).as("_pay"))
      .withColumn("_side", lit(0))
    val unioned = l.select(
      (leftCols.map(col) :+ col("_side") :+ col("_pay")): _*
    ).unionByName(
      r.select(
        (leftCols.map(c => if (c == key || c == ts) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c))
          :+ col("_side") :+ col("_pay")): _*))
    // right (_side=0) sorts before a same-ts left row: the backward
    // frame sees it (zero-delta match), the forward frame does not —
    // which is exactly the tie rule
    val wB = Window.partitionBy(key).orderBy(col(ts), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward direction via the reversed running frame (same O(n)
    // rewrite as [[asOfForward]] — the unbounded-following form
    // re-scanned the tail per row)
    val wF = Window.partitionBy(key)
      .orderBy(col(ts).desc, col("_side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rightTs = when(col("_side") === 0, col(ts))
    val dB = unix_micros(col(ts)) - unix_micros(col("_bt"))
    val dF = unix_micros(col("_ft")) - unix_micros(col(ts))
    val useB = col("_bt").isNotNull && (col("_ft").isNull || dB <= dF)
    unioned
      .withColumn("_bp", last(col("_pay"), ignoreNulls = true).over(wB))
      .withColumn("_bt", last(rightTs, ignoreNulls = true).over(wB))
      .withColumn("_fp", last(col("_pay"), ignoreNulls = true).over(wF))
      .withColumn("_ft", last(rightTs, ignoreNulls = true).over(wF))
      .filter(col("_side") === 1)
      .withColumn(as, when(useB, col("_bp")).otherwise(col("_fp")))
      .withColumn("delta_ms",
        when(useB, -expr(s"(unix_micros(`$ts`) - unix_micros(_bt)) div 1000"))
          .otherwise(expr(s"(unix_micros(_ft) - unix_micros(`$ts`)) div 1000")))
      .drop("_side", "_pay", "_bp", "_bt", "_fp", "_ft")
  }

  /** Binned range join: for each left row, aggregate right rows of the
    * same key whose `ts` falls in `(leftTs - windowSec, leftTs]`.
    *
    * A naive inequality join is a per-key cross product (Spark plans
    * BroadcastNestedLoopJoin — quadratic, cluster-killing). Binning
    * makes it an EQUI-join: each left row explodes into the
    * ⌈window/bin⌉+1 time bins its range can touch, right rows carry
    * their own bin, the join key is (key, bin), and the exact range
    * predicate filters the within-bin candidates. Shuffle cost is
    * O((w/b+1)·|L| + |R|) rows — linear, AQE-balanceable — the standard
    * scale pattern for interval association.
    */
  def rangeCountJoin(left: DataFrame, right: DataFrame, key: String,
      ts: String, windowSec: Long, binSec: Long): DataFrame = {
    // Bins derive from second-floored epochs (conservative superset of
    // the range); the exact predicate runs on the full-precision
    // timestamps. left_outer + count(non-null) keeps zero-match rows.
    // Ceiling division: when windowSec is not a multiple of binSec the
    // range can still reach ⌈window/bin⌉ bins back (integer division
    // would silently exclude the earliest reachable bin).
    val binsBack = (windowSec + binSec - 1) / binSec
    val l = left
      .withColumn("_lsec", unix_timestamp(col(ts)))
      .withColumn("_bin",
        explode(expr(s"sequence(_lsec div $binSec - $binsBack, " +
          s"_lsec div $binSec)")))
      .drop("_lsec")
    val r = right
      .select(col(key), col(ts).as("_rts"))
      .withColumn("_bin", expr(s"unix_timestamp(_rts) div $binSec"))
    l.join(r, Seq(key, "_bin"), "left_outer")
      .withColumn("_hit",
        when(col("_rts") > col(ts) - expr(s"INTERVAL $windowSec SECONDS") &&
          col("_rts") <= col(ts), col("_rts")))
      .groupBy(left.columns.map(col): _*)
      .agg(count(col("_hit")).as("n_in_range"))
  }
}
