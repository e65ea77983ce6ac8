package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W3/F8 — the reference's one genuine composite operator (SURVEY.md §7.4):
  * time-series regularization. Reference `training_code/clean_data.ipynb`
  * cells 5+8: reindex to a fixed-frequency grid, linear-interpolate value
  * columns between nearest observed neighbors, forward-fill count columns,
  * leave leading gaps null (pandas `interpolate()` semantics).
  *
  * Spark-first design: grid generation is `sequence()` + `explode` (no
  * driver loop), gap fill is four window functions (prev/next non-null
  * value and timestamp) + a linear blend — all whole-stage-codegen
  * expressions, one shuffle on the symbol key.
  */
object Resample {

  /** Hourly-bucket observed series → dense hourly grid with interpolated
    * `price_filled` and forward-filled `n_trades_ff`.
    *
    * Semantics pinned (identical in the DuckDB oracle):
    *  - observed buckets keep their exact (rounded) value;
    *  - interior gaps: linear blend between previous and next observation,
    *    weighted by time distance;
    *  - leading gaps (before first observation) stay null;
    *  - trailing gaps carry the last observation forward (pandas
    *    `limit_direction='forward'` behavior, `clean_data.ipynb` cell 8).
    */
  def interpolateHourly(trades: DataFrame): DataFrame = {
    // Bucket representative = LAST observation in the bucket (max_by on
    // the event_id tiebreak) — the point-value semantics of pandas
    // reindex, and exact/order-independent: an avg(double) here sat on
    // a round(6) boundary at sf0.1 and flipped between engines by one
    // ulp of summation order.
    val obs = trades
      .groupBy(col("symbol"), date_trunc("hour", col("timestamp")).as("bucket"))
      .agg(max_by(col("price"), col("event_id")).as("p"), count(lit(1)).as("n"))

    val grid = obs.groupBy("symbol")
      .agg(min(col("bucket")).as("mn"), max(col("bucket")).as("mx"))
      .select(col("symbol"),
        explode(expr("sequence(mn, mx, interval 1 hour)")).as("bucket"))

    val joined = grid.join(obs, Seq("symbol", "bucket"), "left")

    val past = Window.partitionBy("symbol").orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // "next non-null" as last() over the DESCENDING prefix, not first()
    // over an UNBOUNDED FOLLOWING frame: Spark's unbounded-following
    // frame recomputes its aggregate from scratch per row — O(rows²)
    // per partition, measured 17× blowup at 10× data. The reversed
    // prefix frame is incremental O(rows) and frame-equivalent
    // (both include the current row).
    val pastRev = Window.partitionBy("symbol").orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val obsBucket = when(col("p").isNotNull, col("bucket"))
    val withNeighbors = joined
      .withColumn("pv", last(col("p"), ignoreNulls = true).over(past))
      .withColumn("pt", last(obsBucket, ignoreNulls = true).over(past))
      .withColumn("nv", last(col("p"), ignoreNulls = true).over(pastRev))
      .withColumn("nt", last(obsBucket, ignoreNulls = true).over(pastRev))
      .withColumn("n_ff", last(col("n"), ignoreNulls = true).over(past))

    val frac = (unix_timestamp(col("bucket")) - unix_timestamp(col("pt"))).cast("double") /
      (unix_timestamp(col("nt")) - unix_timestamp(col("pt"))).cast("double")
    val blended =
      when(col("p").isNotNull, col("p"))
        .when(col("pv").isNull, lit(null).cast("double"))
        .when(col("nv").isNull, col("pv"))
        .otherwise(col("pv") + (col("nv") - col("pv")) * frac)

    withNeighbors
      .select(col("symbol"), col("bucket"),
        (blended).as("price_filled"),
        col("n_ff").as("n_trades_ff"))
  }
}
