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
    def decSum(c: Column) = sum(c.cast("decimal(18,6)")).over(w).cast("double")
    bars.select(col("symbol"), col("timestamp"),
        collect_list(struct(
          col("close"), col("high"), col("low"),
          col("total_usd_volume").as("usd"),
          col("total_volume").as("vol"),
          col("num_trades").cast("double").as("nt"))).over(w).as("matrix"),
        decSum(col("close")).as("sum_close"),
        decSum(col("total_usd_volume")).as("sum_usd"),
        decSum(col("num_trades").cast("double")).as("sum_trades"))
      .filter(size(col("matrix")) === n)
      .select(col("symbol"), col("timestamp"),
        size(col("matrix")).as("n_rows"),
        expr("element_at(matrix, 1).close").as("first_close"),
        expr(s"element_at(matrix, $n).close").as("last_close"),
        col("sum_close"), col("sum_usd"), col("sum_trades"))
  }

  /** Per-symbol min/max of every feature — the fitted scaler
    * (`predict_btc.py:40-50` fits MinMaxScaler over the features).
    * Tiny aggregate; broadcast at the join. */
  private def scalerStats(bars: DataFrame): DataFrame =
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
         |    CAST(floor((CAST(i AS DOUBLE) / ${wsum(n)}.0D) * ($combo)
         |         * 1000000000000.0D + 0.5D) AS BIGINT)),
         |  0L,
         |  (acc, x) -> acc + x) AS DOUBLE) / 1000000000000.0D""".stripMargin)
  }

  /** The full inference pass: matrix → scaler stats → score →
    * inverse-scale into the close-price range → shift to the next
    * 10-second interval (`predict_btc.py:83-84`). `scorer` is the
    * pluggable model seam. */
  def predictNext(trades: DataFrame, n: Int = lookbackN,
      scorer: Column = null): DataFrame = {
    val bars = TradeOps.slidingFeatures(trades)
    val sc = Option(scorer).getOrElse(linearScorer(n))
    lookbackMatrix(bars, n)
      .join(broadcast(scalerStats(bars)), "symbol")
      .withColumn("score", sc)
      // no final round: the decimal score casts to a bit-identical double
      // in both engines (unscaled value < 2^53 → exact conversion), and
      // mn + score·(mx−mn) over identical doubles is IEEE-deterministic.
      // round(·, 6) here actually BROKE parity: predictions cluster near
      // half-boundaries and Spark (exact-expansion HALF_UP) vs DuckDB
      // (float-multiply rounding) flipped ~2% of rows by 1e-6.
      .select(col("symbol"),
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
      |         CAST(sum(CAST(usd_volume AS DECIMAL(18,6))) AS DOUBLE) AS usd,
      |         CAST(sum(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS vol,
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
       |         CAST(sum(CAST(close AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_close,
       |         CAST(sum(CAST(usd AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_usd,
       |         CAST(sum(CAST(nt AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_trades
       |  FROM bars
       |  WINDOW w AS (PARTITION BY symbol ORDER BY "timestamp"
       |               ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW)
       |)
       |SELECT * FROM win WHERE n_rows = $n""".stripMargin

  def predictSql(n: Int = lookbackN): String = {
    val sclSql = (x: String, f: String) =>
      s"(CASE WHEN s.mx_$f = s.mn_$f THEN 0.5::DOUBLE ELSE ($x - s.mn_$f) / (s.mx_$f - s.mn_$f) END)"
    val combo = mix.map { case (f, u) => s"$u::DOUBLE * ${sclSql(s"r.$f", f)}" }
      .mkString(" + ")
    val statCols = mix.map(_._1)
      .map(f => s"min($f) AS mn_$f, max($f) AS mx_$f").mkString(", ")
    s"""${graft.Tables.tradesCte}, $barsCte,
       |stats AS (
       |  SELECT symbol, $statCols FROM bars GROUP BY 1
       |), numbered AS (
       |  SELECT b.*, row_number() OVER (PARTITION BY symbol ORDER BY "timestamp") AS rn
       |  FROM bars b
       |), terms AS (
       |  SELECT e.symbol, e."timestamp" AS ets,
       |         CAST(floor((CAST(r.rn - e.rn + $n AS DOUBLE) / ${wsum(n)}.0::DOUBLE) * ($combo)
       |              * 1000000000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS term
       |  FROM numbered e
       |  JOIN numbered r ON r.symbol = e.symbol AND r.rn BETWEEN e.rn - ${n - 1} AND e.rn
       |  JOIN stats s ON s.symbol = e.symbol
       |  WHERE e.rn >= $n
       |), score AS (
       |  SELECT symbol, ets, CAST(sum(term) AS DOUBLE) / 1000000000000.0::DOUBLE AS sc
       |  FROM terms GROUP BY 1, 2
       |)
       |SELECT sco.symbol, sco.ets + INTERVAL 10 SECOND AS "timestamp",
       |       s.mn_close + sco.sc * (s.mx_close - s.mn_close) AS predicted_close
       |FROM score sco JOIN stats s ON s.symbol = sco.symbol""".stripMargin
  }
}
