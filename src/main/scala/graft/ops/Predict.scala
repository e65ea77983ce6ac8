package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's model-inference vertical (SURVEY.md §2.9; reference
  * `BtcPrediction/predict_btc.py:37-62,88-91` + `kafka.py:42-57`):
  * assemble a fixed-length lookback matrix of feature bars per symbol,
  * min-max scale, score it with a pluggable model, inverse-scale the
  * score back to the price domain, and upsert the prediction at the
  * next interval (t+10s) into the keyed store (K7).
  *
  * The scorer is a seam: the reference runs an LSTM there; the engine
  * ships a deterministic recency-weighted linear stand-in (SURVEY §2.9
  * prescribes exactly this for parity testing) so the whole vertical is
  * DuckDB-oracle-checkable. A real model plugs in as any
  * `Column => Column` over the matrix — batched native inference would
  * ride `mapPartitions`/`mapInPandas` at the same point in the plan.
  *
  * Scale posture: the matrix is a per-symbol sliding window
  * (`rowsBetween(-(n-1), 0)` + `collect_list(struct)`) — one shuffle on
  * symbol, rows never leave their partition afterwards; the fitted
  * min-max stats are a tiny per-symbol aggregate broadcast back
  * (identical to [[TradeOps.minMaxScale]]); scoring is a per-row array
  * expression inside codegen; the writeback is the bucket-local
  * [[graft.sinks.Upsert]] merge.
  */
object Predict {

  /** Lookback length (reference `kafka.py:44`: `lookback = 100`). */
  val lookbackN = 100

  /** Sum of 1..n — the normalizer of the recency weights. */
  private def wsum(n: Int): Long = n.toLong * (n + 1) / 2

  /** Feature-mix weights of the linear stand-in scorer (convex: sums to
    * 1, so a scaled-feature combo stays in [0,1] and the score
    * inverse-maps into the observed price range). Close dominates —
    * the stand-in predicts "close persists, nudged by the rest". */
  val mix: Seq[(String, Double)] = Seq(
    "close" -> 0.85, "high" -> 0.05, "low" -> 0.05,
    "usd" -> 0.03, "vol" -> 0.01, "nt" -> 0.01)

  /** Per-symbol sliding lookback matrix over the OHLC feature bars
    * ([[TradeOps.slidingFeatures]] output): for every bar once the
    * window is full, the previous `n` bars (oldest first) as an
    * `array<struct>` — the batch form of the streaming consumer's
    * buffer (`kafka.py:42-57`), and the `(n, 6)` input the scorer
    * consumes. */
  def lookbackMatrix(bars: DataFrame, n: Int = lookbackN): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("timestamp")
      .rowsBetween(-(n - 1), Window.currentRow)
    bars.select(col("symbol"), col("timestamp"),
        collect_list(struct(
          col("close"), col("high"), col("low"),
          col("total_usd_volume").as("usd"),
          col("total_volume").as("vol"),
          col("num_trades").cast("double").as("nt"))).over(w).as("matrix"))
      .filter(size(col("matrix")) === n)
  }

  /** Matrix digests for the oracle gate: the assembled array's size and
    * edge elements (proving length and ELEMENT ORDER of the physical
    * array) plus exact-decimal per-feature sums over the same frame —
    * values DuckDB reproduces with plain window aggregates.
    *
    * The sums are deliberately plain window aggregates sharing the
    * matrix's window spec, NOT `aggregate()` folds over the array:
    * higher-order-function lambdas evaluate interpreted, and three folds
    * over 300k × 100 elements measured ~7s at sf0.1 where the codegen'd
    * window sums add ~0.5s. The array is still physically built (the
    * element_at probes read it), so assembly stays exercised. */
  def lookbackMatrixDigest(trades: DataFrame, n: Int = lookbackN): DataFrame = {
    val bars = TradeOps.slidingFeatures(trades)
    val w = Window.partitionBy("symbol").orderBy("timestamp")
      .rowsBetween(-(n - 1), Window.currentRow)
    // micro-LONG frame sums (Num.decDWin): value-identical to the
    // decimal-sum decD route the oracle mirrors, but the per-row frame
    // work is long adds + one cast instead of BigDecimal adds + a
    // guard + two casts + divide — the r13 floor paid 1.7× for the
    // latter on this op (ADVICE r13 hoist directive)
    def decSum(c: Column) = graft.Num.decDWin(c, w)
    // r17 (guide §1.2 "don't compute things you throw away"): the digest
    // previously assembled the full 100-struct array per row
    // (collect_list over the sliding frame — O(n) struct copies per row,
    // ~30M struct builds at sf0.1, 15.6 s CPU) only to read its size and
    // two edge elements. Those three probes ARE plain window aggregates
    // over the same frame — count(*), first_value(close), and the
    // current row's close (the frame ends at CURRENT ROW, so with a full
    // frame element n is the current row) — exactly how the oracle SQL
    // has always computed them. The physical-array form survives in
    // [[lookbackMatrix]] (spec-exercised and consumed by [[predict]]).
    bars.select(col("symbol"), col("timestamp"),
        count(lit(1)).over(w).cast("int").as("n_rows"),
        first(col("close")).over(w).as("first_close"),
        col("close").as("last_close"),
        decSum(col("close")).as("sum_close"),
        decSum(col("total_usd_volume")).as("sum_usd"),
        decSum(col("num_trades").cast("double")).as("sum_trades"))
      .filter(col("n_rows") === n)
      .select(col("symbol"), col("timestamp"), col("n_rows"),
        col("first_close"), col("last_close"),
        col("sum_close"), col("sum_usd"), col("sum_trades"))
  }

  /** Per-symbol min/max of every feature — the fitted scaler
    * (`predict_btc.py:40-50` fits MinMaxScaler over the features).
    * Tiny aggregate; broadcast at the join. `private[graft]` so
    * [[graft.streaming.StreamingJob.runPredict]] can fit the scaler
    * offline the way predict_btc.py loads its fitted scaler. */
  private[graft] def scalerStats(bars: DataFrame): DataFrame =
    bars.groupBy("symbol").agg(
      min(col("close")).as("mn_close"), max(col("close")).as("mx_close"),
      min(col("high")).as("mn_high"), max(col("high")).as("mx_high"),
      min(col("low")).as("mn_low"), max(col("low")).as("mx_low"),
      min(col("total_usd_volume")).as("mn_usd"), max(col("total_usd_volume")).as("mx_usd"),
      min(col("total_volume")).as("mn_vol"), max(col("total_volume")).as("mx_vol"),
      min(col("num_trades").cast("double")).as("mn_nt"),
      max(col("num_trades").cast("double")).as("mx_nt"))

  /** Min-max scale with the constant-feature convention `0.5` (no scale
    * information → midpoint), spelled as CASE so DuckDB evaluates the
    * bit-identical expression. */
  private def scl(x: String, f: String): String =
    s"(CASE WHEN mx_$f = mn_$f THEN 0.5D ELSE ($x - mn_$f) / (mx_$f - mn_$f) END)"

  /** The deterministic linear stand-in scorer: recency weight
    * `i / (n(n+1)/2)` (oldest row i=1 … newest i=n, weights sum to 1)
    * times the convex feature mix of the scaled row.
    *
    * Cross-engine exactness: each term double is quantized to integer
    * picounits — `floor(term · 1e12 + 0.5)` as BIGINT — and the fold
    * sums longs. The term double itself is IEEE-identical in both
    * engines (same inputs, same written association), floor is exact,
    * and the final `sum/1e12` is one correctly-rounded division of
    * exactly-representable values (|sum| < 2^53), so the score is
    * bit-identical by construction. (DECIMAL casts were NOT portable
    * here: Spark casts through the shortest string representation with
    * HALF_UP while DuckDB rounds a float-multiplied product — measured
    * ~1e-9 drift over a 600-term sum.) Returns a score in [0,1]. */
  def linearScorer(n: Int = lookbackN): Column = {
    val combo = mix.map { case (f, u) => s"${u}D * ${scl(s"m.$f", f)}" }
      .mkString(" + ")
    expr(
      s"""CAST(aggregate(
         |  zip_with(matrix, sequence(1, $n), (m, i) ->
         |    CAST(i AS BIGINT)
         |      * CAST(floor(($combo) * 1000000000000.0D + 0.5D) AS BIGINT)),
         |  0L,
         |  (acc, x) -> acc + x) AS DOUBLE)
         | / (${wsum(n)}.0D * 1000000000000.0D)""".stripMargin)
  }

  /** The full inference pass: matrix → scaler stats → score →
    * inverse-scale into the close-price range → shift to the next
    * 10-second interval (`predict_btc.py:83-84`). `scorer` is the
    * pluggable model seam. */
  /** Bar-table column expression for each scorer feature key. */
  private val barCol: Map[String, String] = Map(
    "close" -> "close", "high" -> "high", "low" -> "low",
    "usd" -> "total_usd_volume", "vol" -> "total_volume",
    "nt" -> "CAST(num_trades AS DOUBLE)")

  /** The full inference pass: scaler stats → score → inverse-scale into
    * the close-price range at t+10s (`predict_btc.py:83-84`).
    *
    * `scorer` is the pluggable model seam: pass any `Column` over the
    * assembled `matrix` column and the (n,6) matrix is physically built
    * and scored per row — a real model would batch rows through
    * `mapPartitions` at exactly this point. When no scorer is given,
    * the default linear model does NOT fold over an array: its weights
    * are linear in position, so Σᵢ iᵣ·qcᵣ decomposes into two plain
    * window sums — `S2 − (rn_end − n)·S1` with `S1 = Σ qc`,
    * `S2 = Σ rn·qc` over the frame — which stay inside whole-stage
    * codegen. Algebraically identical to folding the quantized combos
    * positionally, but scale-safe: the interpreted zip_with/aggregate
    * fold measured 116s at 3M bars (10× probe) where this form stays
    * linear in the window-sum cost. Exactness across engines: qc is an
    * integer (floor(combo·1e12 + 0.5) of an IEEE-identical double), the
    * window sums run in DECIMAL(38,0) (exact integer arithmetic, immune
    * to rounding-mode differences), and the final score ≤ 5050e12 <
    * 2^53 so its double conversion and the one division are
    * correctly-rounded identically in both engines.
    *
    * No final round(·,6) on the prediction: the score double is
    * bit-identical in both engines and mn + score·(mx−mn) over
    * identical doubles is IEEE-deterministic — round() actually BROKE
    * parity (predictions cluster near half-boundaries; Spark's
    * exact-expansion HALF_UP vs DuckDB's float-multiply rounding
    * flipped ~2% of rows by 1e-6). */
  /** The default-scorer pipeline over the feature bars, returning the
    * scored rows WITH their bar columns and fitted per-symbol stats
    * (`mn_*`/`mx_*`) still attached — shared by [[predictNext]] (which
    * keeps only the prediction) and [[predictionAccuracy]] (which also
    * needs the NEXT bar's actual close from the same pass). Extracted
    * verbatim from predictNext's default branch; values are unchanged. */
  private[graft] def scoredDefault(bars: DataFrame, n: Int): DataFrame = {
    val combo = mix.map { case (f, u) => s"${u}D * ${scl(barCol(f), f)}" }
      .mkString(" + ")
    val w = Window.partitionBy("symbol").orderBy("timestamp")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Fitted scaler stats as FULL-frame window aggregates instead of
    // a separate aggregate + broadcast join: the whole-partition
    // frame is evaluated once per partition (O(n), unlike the
    // moving-lower-bound UNBOUNDED FOLLOWING trap), and it saves a
    // second full computation of `bars` (the stats subtree re-ran
    // the 3-window explode+agg — measured ~5s of the 17s at the 10×
    // probe). Values are identical to [[scalerStats]]'s.
    val wAll = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val withStats = mix.map(_._1).foldLeft(bars) { case (df, f) =>
      df.withColumn(s"mn_$f", min(expr(barCol(f))).over(wAll))
        .withColumn(s"mx_$f", max(expr(barCol(f))).over(wAll))
    }
    val dec = "DECIMAL(38,0)"
    // Frame sums via RUNNING sums minus lag(·, n): Spark's bounded
    // sliding frames re-evaluate the whole frame per row (no
    // retraction — O(frame) BigDecimal adds per row, measured 7.6s
    // at 300k bars), while UNBOUNDED PRECEDING frames accumulate
    // incrementally. DECIMAL(38,0) keeps Σ rn·qc exact at any rn
    // (a BIGINT product overflows once rn·qc·n exceeds 2^63).
    withStats
      .withColumn("qc",
        expr(s"CAST(floor(($combo) * 1000000000000.0D + 0.5D) AS BIGINT)"))
      .withColumn("rn", row_number().over(w))
      .withColumn("p", (col("rn").cast(dec) * col("qc").cast(dec)).cast(dec))
      .withColumn("r1", sum(col("qc").cast(dec)).over(run))
      .withColumn("r2", sum(col("p")).over(run))
      .withColumn("s1", col("r1") - coalesce(lag(col("r1"), n).over(w),
        lit(0).cast(dec)))
      .withColumn("s2", col("r2") - coalesce(lag(col("r2"), n).over(w),
        lit(0).cast(dec)))
      .filter(col("rn") >= n)
      .withColumn("score",
        expr(s"CAST(s2 - (CAST(rn AS $dec) - $n) * s1 AS DOUBLE)" +
          s" / (${wsum(n)}.0D * 1000000000000.0D)"))
  }

  def predictNext(trades: DataFrame, n: Int = lookbackN,
      scorer: Column = null): DataFrame = {
    val bars = TradeOps.slidingFeatures(trades)
    val scored = Option(scorer) match {
      case Some(sc) =>
        lookbackMatrix(bars, n)
          .join(broadcast(scalerStats(bars)), "symbol")
          .withColumn("score", sc)
      case None => scoredDefault(bars, n)
    }
    scored.select(col("symbol"),
      (col("timestamp") + expr("INTERVAL 10 SECONDS")).as("timestamp"),
      (col("mn_close") + col("score") * (col("mx_close") - col("mn_close")))
        .as("predicted_close"))
  }

  /** K7, end to end: run [[predictNext]] and MERGE the predictions into
    * the keyed upsert store at `(symbol, timestamp)` — the reference's
    * two-phase prediction upsert (`predict_btc.py:88-91` writes the
    * prediction row Cassandra-upsert-style) — then serve the table back
    * from the store (what Grafana reads). Built once per (session,
    * input), like [[TradeOps.keyedPointRead]]. */
  def predictWriteback(spark: SparkSession, trades: DataFrame,
      dirTag: String): DataFrame = {
    val root = TradeOps.scratchDir(spark,
      "predict_store_" + dirTag.replaceAll("[^A-Za-z0-9]", "_"))
    if (graft.sinks.Upsert.currentVersion(root).isEmpty)
      graft.sinks.Upsert.merge(predictNext(trades), 0L, root,
        keys = Seq("symbol", "timestamp"), bucketBy = Seq("symbol"))
    graft.sinks.Upsert.read(spark, root).get
      .select("symbol", "timestamp", "predicted_close")
  }

  /** K20 — the serving layer's prediction-accuracy scorecard: the
    * reference's Grafana dashboard overlays `curr_price` against
    * `predict_price` on the same timestamp axis and leaves the accuracy
    * judgment to the human eye (`grafana/dashboard.json:404-455`,
    * panel 4's two `columnValue` series over the prediction table K7
    * maintains). This op makes that alignment a first-class metric:
    * each prediction (made at bar t, targeting t+10s —
    * `predict_btc.py:83-84`) is matched with the REALIZED close of the
    * bar at exactly t+10s, and per (symbol, day) the engine emits
    * `n_scored`, `mae`, `bias` (signed mean error), `rmse`, `mape`
    * (over positive actuals only — the corpus contains zero prices),
    * and `n_within_1pct` (count within ±1% of the actual).
    *
    * Matching is a window `lead`, not a join: bar timestamps lie on the
    * 10-second grid ([[TradeOps.slidingFeatures]]), so a bar at t+10s
    * exists iff it is the ordered successor of t — `lead(timestamp)`
    * plus an equality filter is semantically identical to the
    * (symbol, timestamp) equi-join the oracle spells out, but rides the
    * SAME per-symbol window pass that scores the predictions: one scan,
    * one shuffle, no second computation of the bar table. Predictions
    * whose target slot has no bar (no trades in that 10s) are unmatched
    * in both forms and dropped.
    *
    * Cross-engine exactness: predicted and actual close are
    * bit-identical doubles (the [[predictNext]] parity argument), so
    * `err` is one IEEE subtraction. Each metric quantizes its per-row
    * term to an integer — micro-units for |err| and err (floor(x·1e6 +
    * 0.5)), 1e4-units for err² and 1e6-units for |err|/actual (chosen
    * so the worst-case group sum stays far below 2⁵³ — see the bound
    * below) — sums the BIGINTs in DECIMAL(38,0) (exact), asserts the
    * sum ≤ 2⁵³ LOUDLY on both sides (Spark `assert_true`, oracle
    * `error()`), and performs ONE int→double cast (exact under the
    * guard) and ONE correctly-rounded division per metric.
    *
    * Scale posture: output and intermediate grain are GRID-bounded, not
    * data-bounded — per (symbol, day) there are at most 3·8,640 bar
    * slots regardless of trade volume, so group sums are bounded by
    * 26k · (quantized term) ≈ 10¹⁴ at the observed price range (≤561)
    * and the 2⁵³ guard has two decades of headroom; more data makes
    * bars denser, never groups bigger. One window pass + one
    * grid-bounded hash agg; nothing collects. */
  def predictionAccuracy(trades: DataFrame, n: Int = lookbackN): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("timestamp")
    val matched = scoredDefault(TradeOps.slidingFeatures(trades), n)
      .withColumn("pc",
        col("mn_close") + col("score") * (col("mx_close") - col("mn_close")))
      .withColumn("next_ts", lead(col("timestamp"), 1).over(w))
      .withColumn("next_close", lead(col("close"), 1).over(w))
      .filter(col("next_ts") ===
        col("timestamp") + expr("INTERVAL 10 SECONDS"))
      .select(col("symbol"), col("next_ts").as("ts"),
        (col("pc") - col("next_close")).as("err"),
        col("next_close").as("actual"))
    val q = matched
      .withColumn("qe",
        expr("CAST(floor(abs(err) * 1000000.0D + 0.5D) AS BIGINT)"))
      .withColumn("qb",
        expr("CAST(floor(err * 1000000.0D + 0.5D) AS BIGINT)"))
      .withColumn("qs",
        expr("CAST(floor(err * err * 10000.0D + 0.5D) AS BIGINT)"))
      .withColumn("qr", expr("CASE WHEN actual > 0.0D THEN " +
        "CAST(floor(abs(err) / actual * 1000000.0D + 0.5D) AS BIGINT) END"))
      .withColumn("hit",
        expr("CASE WHEN abs(err) <= 0.01D * actual THEN 1L ELSE 0L END"))
    def exactMean(s: Column, nRows: Column, unit: Double): Column = {
      val g = assert_true(s.isNull || abs(s) <= lit(9007199254740992L),
        lit("predictionAccuracy: quantized error sum exceeds 2^53 — " +
          "the int->double cast would round; shrink the quantum"))
      when(g.isNull, s.cast("double")) / (nRows.cast("double") * lit(unit))
    }
    val d38 = "decimal(38,0)"
    q.groupBy(col("symbol"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_scored"),
        sum(col("qe").cast(d38)).as("se"),
        sum(col("qb").cast(d38)).as("sb"),
        sum(col("qs").cast(d38)).as("sq"),
        sum(col("qr").cast(d38)).as("sr"),
        count(col("qr")).as("n_rel"),
        sum(col("hit")).as("nw"))
      .select(col("symbol"), col("day"), col("n_scored"),
        exactMean(col("se"), col("n_scored"), 1e6).as("mae"),
        exactMean(col("sb"), col("n_scored"), 1e6).as("bias"),
        sqrt(exactMean(col("sq"), col("n_scored"), 1e4)).as("rmse"),
        when(col("n_rel") > 0,
          exactMean(col("sr"), col("n_rel"), 1e6)).as("mape"),
        col("nw").as("n_within_1pct"))
  }

  // ------------------------------------------------------------------
  // DuckDB oracles, generated from the same constants (mix, n, wsum) so
  // engine and oracle can never drift.
  // ------------------------------------------------------------------

  /** Feature bars as a DuckDB CTE (the a2_sliding_features oracle shape:
    * each event lands in 3 overlapping 30s/10s windows). Chain after the
    * trades CTE. */
  val barsCte: String =
    """bars AS (
      |  SELECT symbol,
      |         make_timestamp((CAST(floor(epoch("timestamp") / 10) AS BIGINT) * 10 - k) * 1000000)
      |           AS "timestamp",
      |         CAST(CAST(sum(CAST(usd_volume AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0 AS usd,
      |         CAST(CAST(sum(CAST(volume AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0 AS vol,
      |         arg_max(price, event_id) AS close,
      |         max(price) AS high,
      |         min(price) AS low,
      |         CAST(count(price) AS DOUBLE) AS nt
      |  FROM trades CROSS JOIN (VALUES (0), (10), (20)) offs(k)
      |  GROUP BY 1, 2
      |)""".stripMargin

  def lookbackMatrixDigestSql(n: Int = lookbackN): String =
    s"""${graft.Tables.tradesCte}, $barsCte, win AS (
       |  SELECT symbol, "timestamp",
       |         CAST(count(*) OVER w AS INTEGER) AS n_rows,
       |         first_value(close) OVER w AS first_close,
       |         close AS last_close,
       |         CAST(CAST(sum(CAST(close AS DECIMAL(18,6))) OVER w * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0 AS sum_close,
       |         CAST(CAST(sum(CAST(usd AS DECIMAL(18,6))) OVER w * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0 AS sum_usd,
       |         CAST(CAST(sum(CAST(nt AS DECIMAL(18,6))) OVER w * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0 AS sum_trades
       |  FROM bars
       |  WINDOW w AS (PARTITION BY symbol ORDER BY "timestamp"
       |               ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW)
       |)
       |SELECT * FROM win WHERE n_rows = $n""".stripMargin

  def predictSql(n: Int = lookbackN): String = {
    val sclSql = (x: String, f: String) =>
      s"(CASE WHEN s.mx_$f = s.mn_$f THEN 0.5::DOUBLE ELSE ($x - s.mn_$f) / (s.mx_$f - s.mn_$f) END)"
    val combo = mix.map { case (f, u) => s"$u::DOUBLE * ${sclSql(s"nb.$f", f)}" }
      .mkString(" + ")
    val statCols = mix.map(_._1)
      .map(f => s"min($f) AS mn_$f, max($f) AS mx_$f").mkString(", ")
    // mirrors the engine's decomposed form: per-row integer quantization
    // qc = floor(combo·1e12 + 0.5), position weight i = rn_r − rn_e + n,
    // exact integer sum of i·qc, one double conversion + division
    s"""${graft.Tables.tradesCte}, $barsCte,
       |stats AS (
       |  SELECT symbol, $statCols FROM bars GROUP BY 1
       |), numbered AS (
       |  SELECT b.*, row_number() OVER (PARTITION BY symbol ORDER BY "timestamp") AS rn
       |  FROM bars b
       |), qrows AS (
       |  SELECT nb.symbol, nb."timestamp", nb.rn,
       |         CAST(floor(($combo) * 1000000000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS qc
       |  FROM numbered nb JOIN stats s ON s.symbol = nb.symbol
       |), terms AS (
       |  SELECT e.symbol, e."timestamp" AS ets,
       |         CAST(r.rn - e.rn + $n AS BIGINT) * r.qc AS term
       |  FROM qrows e
       |  JOIN qrows r ON r.symbol = e.symbol AND r.rn BETWEEN e.rn - ${n - 1} AND e.rn
       |  WHERE e.rn >= $n
       |), score AS (
       |  SELECT symbol, ets,
       |         CAST(sum(term) AS DOUBLE) / (${wsum(n)}.0::DOUBLE * 1000000000000.0::DOUBLE) AS sc
       |  FROM terms GROUP BY 1, 2
       |)
       |SELECT sco.symbol, sco.ets + INTERVAL 10 SECOND AS "timestamp",
       |       s.mn_close + sco.sc * (s.mx_close - s.mn_close) AS predicted_close
       |FROM score sco JOIN stats s ON s.symbol = sco.symbol""".stripMargin
  }

  /** K20 oracle: the [[predictSql]] chain, then the (symbol, timestamp)
    * equi-join against the realized bar closes (the join form the
    * engine's `lead` is provably identical to on the 10-second grid),
    * the same integer quantization per metric, exact HUGEINT sums with
    * the mirrored LOUD 2⁵³ guard (`error()`), and one division per
    * metric. */
  def predictionAccuracySql(n: Int = lookbackN): String = {
    val sclSql = (x: String, f: String) =>
      s"(CASE WHEN s.mx_$f = s.mn_$f THEN 0.5::DOUBLE ELSE ($x - s.mn_$f) / (s.mx_$f - s.mn_$f) END)"
    val combo = mix.map { case (f, u) => s"$u::DOUBLE * ${sclSql(s"nb.$f", f)}" }
      .mkString(" + ")
    val statCols = mix.map(_._1)
      .map(f => s"min($f) AS mn_$f, max($f) AS mx_$f").mkString(", ")
    def guarded(s: String): String =
      s"""(CASE WHEN abs($s) > 9007199254740992 THEN
         |        CAST(error('predictionAccuracy oracle: quantized error sum exceeds 2^53') AS DOUBLE)
         |        ELSE CAST($s AS DOUBLE) END)""".stripMargin
    s"""${graft.Tables.tradesCte}, $barsCte,
       |stats AS (
       |  SELECT symbol, $statCols FROM bars GROUP BY 1
       |), numbered AS (
       |  SELECT b.*, row_number() OVER (PARTITION BY symbol ORDER BY "timestamp") AS rn
       |  FROM bars b
       |), qrows AS (
       |  SELECT nb.symbol, nb."timestamp", nb.rn,
       |         CAST(floor(($combo) * 1000000000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS qc
       |  FROM numbered nb JOIN stats s ON s.symbol = nb.symbol
       |), terms AS (
       |  SELECT e.symbol, e."timestamp" AS ets,
       |         CAST(r.rn - e.rn + $n AS BIGINT) * r.qc AS term
       |  FROM qrows e
       |  JOIN qrows r ON r.symbol = e.symbol AND r.rn BETWEEN e.rn - ${n - 1} AND e.rn
       |  WHERE e.rn >= $n
       |), score AS (
       |  SELECT symbol, ets,
       |         CAST(sum(term) AS DOUBLE) / (${wsum(n)}.0::DOUBLE * 1000000000000.0::DOUBLE) AS sc
       |  FROM terms GROUP BY 1, 2
       |), pred AS (
       |  SELECT sco.symbol, sco.ets + INTERVAL 10 SECOND AS ts,
       |         s.mn_close + sco.sc * (s.mx_close - s.mn_close) AS pc
       |  FROM score sco JOIN stats s ON s.symbol = sco.symbol
       |), q AS (
       |  SELECT p.symbol, p.ts, p.pc - b.close AS err, b.close AS actual
       |  FROM pred p JOIN bars b ON b.symbol = p.symbol AND b."timestamp" = p.ts
       |)
       |SELECT symbol, date_trunc('day', ts) AS day,
       |       CAST(count(*) AS BIGINT) AS n_scored,
       |       ${guarded("sum(CAST(floor(abs(err) * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT))")}
       |         / (CAST(count(*) AS DOUBLE) * 1000000.0::DOUBLE) AS mae,
       |       ${guarded("sum(CAST(floor(err * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT))")}
       |         / (CAST(count(*) AS DOUBLE) * 1000000.0::DOUBLE) AS bias,
       |       sqrt(${guarded("sum(CAST(floor(err * err * 10000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT))")}
       |         / (CAST(count(*) AS DOUBLE) * 10000.0::DOUBLE)) AS rmse,
       |       CASE WHEN count(CASE WHEN actual > 0.0::DOUBLE THEN 1 END) > 0 THEN
       |         ${guarded("sum(CASE WHEN actual > 0.0::DOUBLE THEN CAST(floor(abs(err) / actual * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) END)")}
       |         / (CAST(count(CASE WHEN actual > 0.0::DOUBLE THEN 1 END) AS DOUBLE) * 1000000.0::DOUBLE)
       |       END AS mape,
       |       CAST(sum(CASE WHEN abs(err) <= 0.01::DOUBLE * actual THEN 1 ELSE 0 END) AS BIGINT) AS n_within_1pct
       |FROM q GROUP BY 1, 2""".stripMargin
  }
}
