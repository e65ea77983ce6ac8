package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational breadth of the engine — grouped aggregation, multi-way
  * joins (broadcast + shuffle), semi/anti joins, distinct aggregation,
  * analytic window functions, and rollup — exercised over the TPC-H-ish
  * synthetic tables (TESTDATA.md).
  *
  * Determinism rules for oracle parity (SURVEY.md §7.4): money sums go
  * through exact DECIMAL casts (the generated prices are exactly
  * 2-decimal, so the cast is lossless and the sum is order-independent);
  * plain double sums are only used where magnitudes keep reorder noise
  * far below the 6-decimal rounding.
  *
  * Scale notes: dimension joins (`nation`, `region`, `supplier`,
  * fitted-stats) are explicitly `broadcast()`; fact-fact joins shuffle on
  * their keys and AQE handles skew; every aggregate is partial+final.
  */
object Relational {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,6)")

  /** TPC-H Q1-style pricing summary over lineitem. */
  /** Deterministic DECIMAL→DOUBLE for corpus-scale money aggregates:
    * route through the exact micro-unit BIGINT so both engines perform
    * the SAME single IEEE long→double rounding. A direct decimal cast
    * is correctly rounded in Spark (BigDecimal) but double-rounded
    * through int128 halves in DuckDB — divergent by 1 ulp once the sum
    * exceeds 2⁵³ micro-units (≈9·10⁹ money units; caught by the r13
    * sf1 sweep on q1's sum_charge). Money inputs carry ≤6 decimals, so
    * the micro value is an EXACT integer — no precision is lost.
    * Ceiling: sums past ~9.2·10¹² units would overflow the BIGINT. */
  private def decD(c: org.apache.spark.sql.Column) = graft.Num.decD(c)

  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        // r14 ADVICE: quantity sums/means route through the decD
        // discipline like the adjacent money columns — a raw
        // sum(double) is only cross-engine/run-to-run exact while
        // quantities stay integral below 2^53; the exact decimal →
        // micro-BIGINT → one long→double cast holds for any ≤6-decimal
        // corpus.
        decD(sum(dec(col("l_quantity")))).as("sum_qty"),
        decD(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
        decD(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")))))
          .as("sum_disc_price"),
        decD(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))))
          .as("sum_charge"),
        (decD(sum(dec(col("l_quantity")))) / count(lit(1)))
          .as("avg_qty"),
        (decD(sum(dec(col("l_extendedprice")))) / count(lit(1)))
          .as("avg_price"),
        (decD(sum(dec(col("l_discount")))) / count(lit(1)))
          .as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** TPC-H Q3-style: customer ⨝ orders ⨝ lineitem, top-10 revenue.
    * Revenue is an exact decimal sum, so the top-k ordering is
    * deterministic (tiebreak on orderkey). */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.load(spark, dir, "orders")
    val li = Tables.load(spark, dir, "lineitem")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
      .agg(decD(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")))))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style: revenue by customer nation across a 5-way join;
    * nation and region are broadcast dimensions. */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val ord = Tables.load(spark, dir, "orders")
    val li = Tables.load(spark, dir, "lineitem")
    val nat = Tables.load(spark, dir, "nation")
    val reg = Tables.load(spark, dir, "region")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        decD(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")))))
          .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Left-semi join: customers that have at least one order (EXISTS). */
  def customersWithOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val ord = Tables.load(spark, dir, "orders").select("o_custkey")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
  }

  /** Left-anti join: customers with no orders (NOT EXISTS). */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val ord = Tables.load(spark, dir, "orders").select("o_custkey")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
  }

  /** Exact distinct aggregation per group (expand + two-phase agg under
    * the hood; the approx_count_distinct variant is benched separately). */
  def distinctCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(lit(1)).as("n_rows"))

  /** HLL++ approximate distinct per group — the form that survives
    * 100 TB, where exact countDistinct's expand+dedup shuffle does not.
    * Fixed relative error; a sketch is a few KB per group
    * regardless of cardinality, and partial sketches merge
    * associatively (single shuffle). rsd 0.02 — halving the error again
    * quadruples the register arrays and tripled measured agg time for
    * no downstream benefit. No DuckDB oracle (sketch implementations
    * differ across engines); accuracy is spec-checked against
    * [[distinctCounts]] instead. */
  def approxDistinctCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_suppkey"), rsd = 0.02).as("approx_supp"),
        approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx_part"),
        count(lit(1)).as("n_rows"))

  /** Oracle-checkable form of [[approxDistinctCounts]]: exact and sketch
    * counts in ONE aggregate pass, emitting the exact counts plus
    * `*_within_3rsd` flags (1 iff |HLL − exact| ≤ 3·rsd·exact). Sketches
    * aren't cross-engine comparable, but the 3σ envelope is an invariant
    * DuckDB can assert as a constant — if the estimate ever drifts out,
    * the flag flips to 0 and the hash compare goes red. */
  def approxDistinctChecked(spark: SparkSession, dir: String): DataFrame = {
    val rsd = 0.02
    val li = Tables.load(spark, dir, "lineitem")
    // Two aggregates + a 3-row broadcast join, NOT one combined agg: a
    // combined plan drags the HLL sketch buffers through the
    // countDistinct expand (3× the rows each carrying register arrays)
    // — measured 2.2s vs 1.0s for the split form at sf0.1. Sketch
    // merging is register-wise max, so the estimate is plan-independent.
    val exact = li.groupBy("l_returnflag").agg(
      countDistinct(col("l_suppkey")).as("n_supp"),
      countDistinct(col("l_partkey")).as("n_part"),
      count(lit(1)).as("n_rows"))
    val approx = li.groupBy("l_returnflag").agg(
      approx_count_distinct(col("l_suppkey"), rsd).as("a_supp"),
      approx_count_distinct(col("l_partkey"), rsd).as("a_part"))
    exact.join(broadcast(approx), "l_returnflag")
      .select(col("l_returnflag"), col("n_supp"), col("n_part"), col("n_rows"),
        (abs(col("a_supp") - col("n_supp")) <= col("n_supp") * (3 * rsd))
          .cast("int").as("supp_within_3rsd"),
        (abs(col("a_part") - col("n_part")) <= col("n_part") * (3 * rsd))
          .cast("int").as("part_within_3rsd"))
  }

  /** Mergeable HLL sketches (Datasketches `hll_sketch_agg` /
    * `hll_union_agg`) — the distinct-count shape that actually works at
    * 100 TB: sketch once per partition/group, then MERGE the fixed-size
    * register arrays, never re-scan the raw data for a broader scope.
    * Here: one sketch per returnflag group, unioned to the global
    * distinct-supplier estimate. The oracle pins the exact counts and an
    * accuracy envelope flag (default lgK=12 → rsd ≈ 1.6%, flag at 5%),
    * the [[approxDistinctChecked]] discipline — if sketch or merge broke,
    * the flag flips and the row goes red. */
  def hllMergeDistinct(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val sketches = li.groupBy("l_returnflag")
      .agg(hll_sketch_agg(col("l_suppkey")).as("sk"))
    val merged = sketches.agg(
      count(lit(1)).as("n_sketches"),
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val exact = li.agg(countDistinct(col("l_suppkey")).as("exact_supp"))
    merged.crossJoin(broadcast(exact))
      .select(col("n_sketches"), col("exact_supp"),
        (abs(col("est") - col("exact_supp")) <= col("exact_supp") * 0.05)
          .cast("int").as("within_5pct"))
  }

  /** A28 (extension) — HLL set-INTERSECTION estimate by
    * inclusion–exclusion: `|A∩B| ≈ est(A) + est(B) − est(A∪B)`, with
    * the union taken by sketch merge (`hll_union`), never by
    * re-scanning — the audience-overlap / cross-segment-dedup question
    * ("how many suppliers serve both return classes?") answered from
    * two fixed-size register arrays. This is THE reason mergeable
    * sketches matter at 100 TB: each segment's sketch is built in one
    * partial-aggregated pass (or read precomputed from a cube), and
    * every pairwise overlap after that is register arithmetic.
    *
    * Oracle discipline = [[hllMergeDistinct]]: the exact cardinalities
    * pin the data, and an accuracy-envelope flag pins the sketch —
    * inclusion–exclusion compounds up to three ±1.6% (lgK=12) errors,
    * so the envelope is 5% of (|A|+|B|), and a broken sketch or merge
    * flips the flag red. At every tested sf the supplier cardinality
    * sits in HLL's sparse-exact regime, so the flag is deterministic,
    * not statistical. */
  def hllIntersect(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val a = li.filter(col("l_returnflag") === "R")
      .agg(hll_sketch_agg(col("l_suppkey")).as("ska"),
        countDistinct(col("l_suppkey")).as("exact_a"))
    val b = li.filter(col("l_returnflag") === "A")
      .agg(hll_sketch_agg(col("l_suppkey")).as("skb"),
        countDistinct(col("l_suppkey")).as("exact_b"))
    val both = li.filter(col("l_returnflag") === "R").select("l_suppkey")
      .intersect(li.filter(col("l_returnflag") === "A").select("l_suppkey"))
      .agg(count(lit(1)).as("exact_both"))
    a.crossJoin(b).crossJoin(broadcast(both))
      .select(col("exact_a"), col("exact_b"), col("exact_both"),
        (abs(hll_sketch_estimate(col("ska"))
            + hll_sketch_estimate(col("skb"))
            - hll_sketch_estimate(hll_union(col("ska"), col("skb")))
            - col("exact_both"))
          <= (col("exact_a") + col("exact_b")) * 0.05)
          .cast("int").as("within_env"))
  }

  /** Count-min-sketch heavy hitters — the frequency member of the
    * sketch family ([[hllMergeDistinct]] distinct, KLL quantiles, Bloom
    * membership): estimate per-key frequencies from d×w integer
    * counters instead of a key-cardinality-sized exact table. At 100 TB
    * the sketch is the only per-partition state (d·w longs, mergeable by
    * plain addition — the same partial-merge property as the HLL
    * registers), and the exact side here exists purely to pin the
    * guarantee: CM never underestimates, and overestimates by at most
    * εN (ε = e/w) with the standard probabilistic bound — checked
    * deterministically per heavy hitter because the salted md5 bucket
    * hashes are fixed, so both engines compute the IDENTICAL integer
    * sketch and the comparison is exact, not statistical.
    *
    * Emits the exact top-`topK` part keys (count DESC, key tie-break)
    * with their exact count, the sketch estimate, and two flags:
    * `never_under` (the CM invariant, must be 1 everywhere) and
    * `within_eps` (estimate − exact ≤ εN). */
  def cmsTopK(spark: SparkSession, dir: String, depth: Int = 4,
      width: Int = 256, topK: Int = 20): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val counts = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // key-cardinality table, read by all d sketch rows
    def bucket(d: Int): Column = expr(
      s"CAST(conv(substring(md5(concat(CAST(l_partkey AS STRING), '_$d')), " +
        s"1, 8), 16, 10) AS BIGINT) % $width")
    // sketch row d: bucket → total count (built from the exact counts —
    // identical to summing the raw stream, since addition is the merge)
    val est = (0 until depth).map { d =>
      val row = counts.withColumn("bucket", bucket(d))
        .groupBy("bucket").agg(sum(col("cnt")).as(s"bsum"))
      counts.withColumn("bucket", bucket(d))
        .join(broadcast(row), "bucket")
        .select(col("l_partkey"), col("bsum").as(s"est_$d"))
    }.reduce(_.join(_, "l_partkey"))
      .select(col("l_partkey"),
        least((0 until depth).map(d => col(s"est_$d")): _*).as("cms_est"))
    val n = li.agg(count(lit(1)).as("n_total"))
    counts.join(est, "l_partkey").crossJoin(broadcast(n))
      .select(col("l_partkey"), col("cnt").as("exact_cnt"), col("cms_est"),
        (col("cms_est") >= col("cnt")).cast("int").as("never_under"),
        ((col("cms_est") - col("cnt")).cast("double") <=
          lit(math.E / width) * col("n_total").cast("double"))
          .cast("int").as("within_eps"))
      .orderBy(col("exact_cnt").desc, col("l_partkey"))
      .limit(topK)
  }

  /** Oracle for [[cmsTopK]] — the identical salted-hash sketch in SQL. */
  def cmsTopKSql(depth: Int = 4, width: Int = 256, topK: Int = 20): String = {
    val bucketSql = (d: Int) =>
      s"('0x' || substr(md5(CAST(l_partkey AS VARCHAR) || '_$d'), 1, 8))::BIGINT % $width"
    // built from the exact counts, like the Spark side
    val sketchCtes = (0 until depth).map { d =>
      s"""s$d AS (
         |  SELECT ${bucketSql(d)} AS bucket, CAST(sum(cnt) AS BIGINT) AS bsum
         |  FROM counts GROUP BY 1
         |), e$d AS (
         |  SELECT c.l_partkey, s$d.bsum AS est_$d
         |  FROM counts c JOIN s$d ON ${bucketSql(d)} = s$d.bucket
         |)""".stripMargin
    }.mkString(",\n")
    val joins = (1 until depth).map(d => s"JOIN e$d USING (l_partkey)").mkString(" ")
    val leastExpr = s"least(${(0 until depth).map(d => s"est_$d").mkString(", ")})"
    s"""WITH counts AS (
       |  SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1
       |), n AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_total FROM lineitem
       |),
       |$sketchCtes,
       |est AS (
       |  SELECT l_partkey, $leastExpr AS cms_est
       |  FROM e0 $joins
       |)
       |SELECT c.l_partkey, CAST(c.cnt AS BIGINT) AS exact_cnt,
       |       CAST(est.cms_est AS BIGINT) AS cms_est,
       |       CAST(est.cms_est >= c.cnt AS INTEGER) AS never_under,
       |       CAST(CAST(est.cms_est - c.cnt AS DOUBLE)
       |         <= ${math.E / width}::DOUBLE * CAST(n.n_total AS DOUBLE)
       |         AS INTEGER) AS within_eps
       |FROM counts c JOIN est USING (l_partkey), n
       |ORDER BY c.cnt DESC, c.l_partkey
       |LIMIT $topK""".stripMargin
  }

  /** Analytic window functions: per-customer order ranking with lag/lead
    * (deterministic tiebreak on orderkey). */
  def orderRanks(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.load(spark, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"))
      .filter(col("rn") <= 3)
  }

  /** Cube aggregation (all grouping-set combinations) over lineitem. */
  def cubeSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      // decD quantity discipline (r14 ADVICE, see pricingSummary)
      .agg(decD(sum(dec(col("l_quantity")))).as("sum_qty"),
        count(lit(1)).as("n_rows"))

  /** Rollup aggregation (subtotals + grand total) over lineitem. */
  def rollupSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      // decD quantity discipline (r14 ADVICE, see pricingSummary)
      .agg(decD(sum(dec(col("l_quantity")))).as("sum_qty"),
        count(lit(1)).as("n_rows"))

  /** TPC-H Q10-style: revenue lost to returned items, by customer, top
    * 20. Fact-fact join shuffles on the order key; the nation dimension
    * broadcasts. Exact decimal revenue makes the top-k deterministic
    * (tiebreak on custkey). */
  def returnedItemRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
    val ord = Tables.load(spark, dir, "orders")
    val cust = Tables.load(spark, dir, "customer")
    val nat = Tables.load(spark, dir, "nation")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(decD(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")))))
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q17-style: revenue from small-quantity orders of each part —
    * lineitems with quantity under 20% of their part's average. The
    * correlated scalar subquery of the original is expressed as a
    * per-part window average: one shuffle on partkey, no re-scan of
    * lineitem (the subquery form scans the fact table twice). */
  def smallQuantityRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val byPart = Window.partitionBy("l_partkey")
    li.withColumn("avg_qty", avg(col("l_quantity")).over(byPart))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(
        decD(sum(dec(col("l_extendedprice")))).as("total_price"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q6-style: revenue change from a discount band in a date
    * range — a pure filter + global aggregate; every predicate pushes
    * to the parquet scan. */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1994-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
        col("l_discount").between(0.02, 0.09) &&
        col("l_quantity") < 24)
      .agg(
        decD(sum(dec(col("l_extendedprice") * col("l_discount"))))
          .as("revenue"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q4-style: orders with at least one returned lineitem,
    * counted by priority — a left-semi join (EXISTS) against the
    * flagged-line set, shuffling only the order keys. (The synthetic
    * lineitem has no commitdate, so "returned" stands in for "late".) */
  def returnedPriorityOrders(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(spark, dir, "orders")
    val flagged = Tables.load(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey")
    ord.join(flagged, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
  }

  /** TPC-H Q12-style: conditional two-way counts after a fact-fact
    * join — per line-status, how many lines belong to critical-priority
    * orders (1-URGENT / 2-HIGH) vs not, in a ship-date year. (The
    * synthetic lineitem has no shipmode; linestatus stands in as the
    * grouping column, which keeps the plan identical: join on orderkey,
    * conditional sums, one shuffle.) Both CASE sums ride the same
    * partial aggregate — one pass, no second scan. */
  def priorityLineCounts(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
    val ord = Tables.load(spark, dir, "orders")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
  }

  /** TPC-H Q14-style: share of revenue from promotional parts in a
    * ship-date window. The part side is a true dimension join —
    * broadcast here; at 100 TB part no longer broadcasts and this
    * becomes a shuffle join on partkey, which is exactly what dropping
    * the hint yields. Numerator and denominator are exact decimal sums
    * in ONE aggregate (a conditional sum, not two scans); the single
    * output row divides once. */
  def promoRevenueShare(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1995-10-01").cast("timestamp"))
    val part = Tables.load(spark, dir, "part")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg(
        decD(sum(when(col("p_type") === "PROMO",
          dec(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .otherwise(dec(lit(0))))).as("promo_revenue"),
        decD(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")))))
          .as("total_revenue"))
      .select(
        (lit(100.0) * col("promo_revenue") / col("total_revenue"))
          .as("promo_pct"),
        col("promo_revenue"), col("total_revenue"))
  }

  /** TPC-H Q18-style: large-volume orders — per-order quantity sums
    * over threshold (GROUP BY + HAVING), then customer/order detail for
    * the survivors. The HAVING prunes before the joins, so only the
    * tiny qualifying set shuffles into them; the big aggregate is
    * partial+final on orderkey. Deterministic top-k: exact quantity
    * sums, tiebreak on orderkey. */
  def largeVolumeOrders(spark: SparkSession, dir: String,
      minQty: Double = 300.0): DataFrame = {
    val big = Tables.load(spark, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > minQty)
    val ord = Tables.load(spark, dir, "orders")
    val cust = Tables.load(spark, dir, "customer")
    ord.join(big, col("o_orderkey") === col("l_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  /** TPC-H Q19-style: disjunctive multi-attribute predicates — three
    * OR'd (brand, size-range, quantity-range) clause groups across the
    * part join. The join key predicate is conjunctive so the join stays
    * a plain equi-join; the OR residual evaluates post-join inside
    * codegen. Catalyst extracts the common `p_size >= 1` conjunct and
    * pushes it to the part scan. */
  def brandedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val part = Tables.load(spark, dir, "part")
    val clause = (b: String, qLo: Int, qHi: Int, sHi: Int) =>
      col("p_brand") === b &&
        col("l_quantity").between(qLo, qHi) &&
        col("p_size").between(1, sHi)
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .filter(clause("Brand#12", 1, 11, 5) ||
        clause("Brand#23", 10, 20, 10) ||
        clause("Brand#34", 20, 30, 15))
      .agg(
        decD(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")))))
          .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q7-style: bilateral trade volume — revenue shipped between two
    * nations (supplier nation ≠ customer nation, both in a fixed pair),
    * by ship year. Two independent broadcast joins against the tiny
    * nation dimension (aliased per role); the fact-fact joins shuffle on
    * orderkey/custkey/suppkey. The nation filter reaches the supplier
    * and customer scans as an IN-list on the (broadcast-joined) keys.
    * Ref: capability breadth beyond ProcessStockStream.py's agg tier. */
  def volumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val nations = Seq("NATION_1", "NATION_2")
    val li = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
    val ord = Tables.load(spark, dir, "orders")
    val cust = Tables.load(spark, dir, "customer")
    val supp = Tables.load(spark, dir, "supplier")
    val natS = Tables.load(spark, dir, "nation")
      .filter(col("n_name").isin(nations: _*))
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val natC = Tables.load(spark, dir, "nation")
      .filter(col("n_name").isin(nations: _*))
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(natS), col("s_nationkey") === col("sn_key"))
      .join(broadcast(natC), col("c_nationkey") === col("cn_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(decD(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")))))
        .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q8-style: national market share — fraction of a region's
    * revenue (for one part type) supplied by one nation, per order year.
    * Numerator and denominator ride ONE aggregate as a conditional sum —
    * no second scan, no self-join. part/nation/region broadcast; at
    * 100 TB part falls back to a shuffle join by dropping the hint. */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val part = Tables.load(spark, dir, "part")
      .filter(col("p_type") === "ECONOMY")
    val ord = Tables.load(spark, dir, "orders")
    val cust = Tables.load(spark, dir, "customer")
    val supp = Tables.load(spark, dir, "supplier")
    val natC = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
    val reg = Tables.load(spark, dir, "region").filter(col("r_name") === "EUROPE")
    val natS = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(natC), col("c_nationkey") === col("cn_key"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(natS), col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        decD(sum(when(col("supp_nation") === "NATION_3",
          dec(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .otherwise(dec(lit(0))))).as("nation_revenue"),
        decD(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")))))
          .as("total_revenue"))
      .select(col("o_year"),
        (col("nation_revenue") / col("total_revenue")).as("mkt_share"),
        col("nation_revenue"), col("total_revenue"))
  }

  /** TPC-H Q9-style: product-line profit by supplier nation and order
    * year. The synthetic schema has no partsupp/supplycost, so cost is
    * modeled as half the part's retail price per unit (documented
    * adaptation — the plan shape is identical: 5-way join, two broadcast
    * dimensions, one grouped sum of a derived amount). Part filter is a
    * substring match pushed to the part scan. */
  def productProfit(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val part = Tables.load(spark, dir, "part")
      .filter(col("p_name").contains("widget"))
    val ord = Tables.load(spark, dir, "orders")
    val supp = Tables.load(spark, dir, "supplier")
    val nat = Tables.load(spark, dir, "nation")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(decD(sum(
        dec(col("l_extendedprice") * (lit(1) - col("l_discount"))) -
          dec(col("p_retailprice") * col("l_quantity") * lit(0.5))))
        .as("profit"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q13-style: distribution of orders-per-customer — customer
    * LEFT OUTER JOIN orders (excluding pending orders), count per
    * customer, then re-aggregate into a histogram. Two shuffles: one on
    * custkey for the join+count, one tiny one on the count value. Null
    * order keys from the outer join count as zero (COUNT(col) semantics,
    * preserved exactly by both engines). */
  def customerOrderDistribution(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer").select("c_custkey")
    val ord = Tables.load(spark, dir, "orders")
      .filter(col("o_orderstatus") =!= "P")
      .select("o_orderkey", "o_custkey")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q15-style: top supplier(s) by revenue in a quarter. The
    * scalar MAX subquery of the original is a rank-1 window over the
    * aggregated (tiny) supplier-revenue table — the fact table is
    * scanned once; the window runs over |suppliers| rows, not lineitem.
    * Exact decimal revenue makes the max deterministic; ties all emit
    * (rank(), like the original's `= max` predicate). */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
    val supp = Tables.load(spark, dir, "supplier")
    val rev = li.groupBy("l_suppkey")
      .agg(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("total_revenue_dec"))
    val w = Window.orderBy(col("total_revenue_dec").desc)
    rev.withColumn("rnk", rank().over(w))
      .filter(col("rnk") === 1)
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        decD(col("total_revenue_dec")).as("total_revenue"))
  }

  /** TPC-H Q21-style: suppliers who were the SOLE returning supplier in
    * a finished multi-supplier order. The original's EXISTS/NOT-EXISTS
    * pair decorrelates into one per-order aggregate — distinct supplier
    * count over all lines vs over returned lines — then a semi-filtering
    * join back to the returned lines. One shuffle on orderkey for the
    * aggregate, one for the join; no correlated re-scans. (No
    * commitdate/receiptdate in the synthetic schema: `l_returnflag='R'`
    * stands in for "failed to meet commit date", per q4.) */
  def soleReturningSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val ord = Tables.load(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F").select("o_orderkey")
    val supp = Tables.load(spark, dir, "supplier")
    // r17 (guide §2.3 "aggregate before you shuffle"): both the
    // per-order distinct-supplier counts and the returned-lines set are
    // derivable from ONE (orderkey, suppkey)-grain reduction with a
    // has-returned flag — count(distinct suppkey) = rows per order,
    // count(distinct returned suppkey) = sum(has_r) — so the previous
    // two lineitem scans (one through a 3-way countDistinct Expand, one
    // through a pair distinct) become one scan + one map-side-combined
    // aggregate. The pair-grain table is checkpointed because both
    // consumers read it (the release-exemption shape tokenBudget
    // documents: a 3-column reduction any reuse would pay to
    // materialize).
    val os = li.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0))
        .as("has_r"))
      .localCheckpoint()
    val perOrder = os.groupBy("l_orderkey").agg(
      count(lit(1)).as("n_supp"),
      sum(col("has_r")).as("n_supp_r"))
      .filter(col("n_supp") >= 2 && col("n_supp_r") === 1)
      .select("l_orderkey")
    val rLines = os.filter(col("has_r") === 1)
      .select("l_orderkey", "l_suppkey")
    rLines
      .join(perOrder, "l_orderkey")
      .join(ord, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** TPC-H Q22-style: positive-balance customers who never ordered,
    * bucketed by nation (the phone-prefix country code of the original;
    * the synthetic schema has no phone column). The global-average
    * scalar subquery is a 1-row broadcast cross join — computed once,
    * shipped to every partition; the NOT EXISTS is a left-anti join on
    * custkey. Balance sums are exact decimal. */
  def idleCustomerBalance(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val ord = Tables.load(spark, dir, "orders").select("o_custkey")
    val avgBal = cust.filter(col("c_acctbal") > 0.0)
      .agg(avg(col("c_acctbal")).as("avg_bal"))
    cust.join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("cntry"))
      .agg(count(lit(1)).as("numcust"),
        decD(sum(dec(col("c_acctbal")))).as("totacctbal"))
  }

  /** The part-supplier catalog the synthetic schema lacks (no partsupp
    * table — TESTDATA.md): derive it from lineitem as one row per
    * (partkey, suppkey) with the minimum observed unit price standing in
    * for ps_supplycost. Double division is bit-identical in Spark and
    * DuckDB, and min() is order-independent, so the derived cost is
    * deterministic cross-engine. One shuffle on (partkey, suppkey) with
    * map-side partial min. */
  private def partSupp(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("ps_supplycost"))

  /** TPC-H Q2-style: for each qualifying part, the EUROPE supplier(s)
    * offering the minimum supply cost. The original's correlated scalar
    * subquery (`ps_supplycost = (SELECT min(...) WHERE ps_partkey =
    * p_partkey ...)`) decorrelates into one grouped min over the
    * region-filtered catalog joined back on (partkey, cost-equals-min) —
    * one scan of the catalog instead of a re-scan per outer row, the
    * only shape that survives 100×. Part filter is applied BEFORE the
    * min (legal: the subquery's min is per-part) so the grouped agg runs
    * on the pruned catalog; dimension sides are broadcast. Final order
    * (s_acctbal desc, n_name, s_name, p_partkey) is a total order —
    * (p_partkey, supplier) pairs are unique — so the top-100 cut is
    * deterministic. */
  def minCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(spark, dir, "part")
      .filter(col("p_size") === 15 && col("p_type") === "STANDARD")
      .select("p_partkey", "p_name")
    val euroSupp = Tables.load(spark, dir, "supplier")
      .join(broadcast(Tables.load(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.load(spark, dir, "region")
          .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val eps = partSupp(spark, dir)
      .join(broadcast(part), col("ps_partkey") === col("p_partkey"))
      .join(broadcast(euroSupp), col("ps_suppkey") === col("s_suppkey"))
    val minCost = eps.groupBy(col("ps_partkey").as("mc_partkey"))
      .agg(min(col("ps_supplycost")).as("min_cost"))
    eps.join(broadcast(minCost),
        col("ps_partkey") === col("mc_partkey") &&
          col("ps_supplycost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"),
        col("ps_supplycost").as("supply_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  /** TPC-H Q11-style: parts whose stock value held by one nation's
    * suppliers exceeds a fixed fraction of that nation's total — the
    * grouped-HAVING-vs-global-scalar shape. The global total is a 1-row
    * aggregate broadcast-cross-joined to every group (computed once, not
    * per-row); both sides of the comparison are exact decimal sums so
    * the cut is deterministic cross-engine. Value per (part, supplier)
    * is quantity × unit supply cost from the derived catalog. */
  def importantStockValue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val natSupp = Tables.load(spark, dir, "supplier")
      .join(broadcast(Tables.load(spark, dir, "nation")
          .filter(col("n_name") === "NATION_7")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val vals = li
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("l_partkey")
      .agg(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("value_dec"))
    val total = vals.agg(sum(col("value_dec")).as("total_dec"))
    vals.join(broadcast(total))
      .filter(col("value_dec") > col("total_dec") * lit(0.001))
      .select(col("l_partkey"),
        decD(col("value_dec")).as("part_value"))
  }

  /** TPC-H Q16-style: distinct-supplier counts per (brand, type, size)
    * for qualifying parts, excluding "complaint" suppliers — the
    * NOT-IN + count(distinct) shape. NOT IN over a non-null key is a
    * left-anti join (broadcast: the exclusion list is tiny); the
    * distinct count is Spark's two-phase expand aggregate. Negative
    * account balance stands in for the original's complaints comment
    * (no comment column in the synthetic schema). */
  def supplierCountByPart(spark: SparkSession, dir: String): DataFrame = {
    val sizes = Seq(1, 4, 9, 14, 23, 36, 45, 49)
    val part = Tables.load(spark, dir, "part")
      .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(sizes: _*))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val complaints = Tables.load(spark, dir, "supplier")
      .filter(col("s_acctbal") < 0.0).select("s_suppkey")
    partSupp(spark, dir)
      .join(broadcast(complaints),
        col("ps_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(part), col("ps_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
  }

  /** TPC-H Q20-style: suppliers in one nation holding "excess" stock of
    * promo-heavy parts — the nested semi-join chain (supplier IN (...
    * partsupp IN (... part ...) AND qty > ½ · correlated sum)). The
    * correlated per-(part,supplier) shipped-quantity subquery
    * decorrelates into a conditional sum inside the SAME grouped
    * aggregate that builds the catalog row — one lineitem scan total.
    * Chain order: filter part (broadcast semi) → grouped agg → excess
    * filter → semi-join back to supplier → nation filter. Quantity sums
    * are exact decimals. */
  def excessStockSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val redParts = Tables.load(spark, dir, "part")
      .filter(col("p_name").startsWith("red")).select("p_partkey")
    val yr0 = lit("1997-01-01").cast("timestamp")
    val yr1 = lit("1998-01-01").cast("timestamp")
    val qty = Tables.load(spark, dir, "lineitem")
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_partkey", "l_suppkey")
      .agg(
        sum(dec(col("l_quantity"))).as("qty_total"),
        sum(when(col("l_shipdate") >= yr0 && col("l_shipdate") < yr1,
          dec(col("l_quantity"))).otherwise(dec(lit(0)))).as("qty_1997"))
      .filter(col("qty_1997") > col("qty_total") * lit(0.5))
      .select("l_suppkey").distinct()
    Tables.load(spark, dir, "supplier")
      .join(broadcast(Tables.load(spark, dir, "nation")
          .filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .join(qty, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name", "s_acctbal")
  }

  /** Explicit GROUPING SETS (the general form rollup/cube sugar over),
    * with per-column `grouping()` flags so consumers can tell a real
    * NULL group key from a subtotal row.
    *
    * Scale shape (r17): the naive single-level form pays Expand's
    * N_sets× row fan-out INTO the partial aggregate — at 3 sets that
    * is 3× the scan rows hashed, measured ~3× the plain groupBy cost
    * at sf0.1 and linearly worse at 100 TB. Both measures here are
    * re-aggregable (decimal sum is exact under re-addition; count
    * re-aggregates as sum), so aggregate at the FINEST grain first —
    * one ordinary map-side-combined pass, |rf|·|ls| ≈ 6 rows out —
    * and run the GROUPING SETS Expand over that tiny intermediate.
    * Identical output (the oracle is the single-level SQL form);
    * Expand now fans out 6 rows instead of the corpus. */
  def groupingSetsSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val (rf, ls) = (col("l_returnflag"), col("l_linestatus"))
    val fine = li.groupBy(rf, ls)
      // decD quantity discipline (r14 ADVICE, see pricingSummary)
      .agg(sum(dec(col("l_quantity"))).as("pq"), count(lit(1)).as("pn"))
    fine.groupingSets(
        Seq(Seq(rf, ls), Seq(rf), Seq.empty[Column]), rf, ls)
      .agg(grouping(rf).as("g_rf"), grouping(ls).as("g_ls"),
        decD(sum(col("pq"))).as("sum_qty"),
        sum(col("pn")).as("n_rows"))
  }

  /** Declarative data-contract CONSTRAINT SUITE (extension, r17; the
    * Deequ / Great-Expectations / dbt-test analog — a NEW validation
    * class: [[a8]]-style null profiling reports statistics, this op
    * evaluates a named CONTRACT and returns a verdict row per
    * constraint). A training-data pipeline gates every ingest on
    * contracts like these before the data reaches dedup/curation;
    * the reference's validation lookup (SURVEY §2 P12) is the
    * single-constraint special case. Ten constraints across four
    * families:
    *
    *  - completeness: `not_null` on orders.o_custkey, events.props;
    *  - uniqueness: o_orderkey; l_orderkey (DUPLICATES BY DESIGN —
    *    multi-line orders — so the suite provably reports failures,
    *    not just green rows); composite (l_orderkey, l_linenumber);
    *  - value domain: o_orderstatus ∈ {F,O,P}, o_totalprice > 0,
    *    l_quantity ∈ [1,50], l_extendedprice ≥ 0 (NULL counts as a
    *    violation — a contract is PASS-affirmative, NOT-TRUE fails);
    *  - referential integrity: lineitem.l_orderkey ⊆ orders.o_orderkey
    *    (left anti join).
    *
    * 100-TB posture (the Deequ design point): all value/completeness
    * checks over one table COMPILE INTO A SINGLE AGGREGATION PASS
    * (partial+final, map-side combined) regardless of how many
    * constraints the contract holds — one scan of orders, one of
    * lineitem, one of events. Uniqueness checks add count(DISTINCT)
    * (an Expand + one exchange on the checked key); the FK check is
    * one shuffled anti join (AQE-eligible; at 100 TB a Bloom
    * pre-filter — [[bloomSemiJoinRevenue]] — prunes the probe scan).
    * Nothing collects; the verdict table is constraint-count-sized. */
  def constraintSuite(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val li = Tables.load(spark, dir, "lineitem")
    val ev = Tables.load(spark, dir, "events")
    // violations = rows where the predicate is NOT TRUE (null fails)
    def notTrue(c: Column): Column =
      coalesce(sum(when(c, 0L).otherwise(1L)), lit(0L))
    val o = orders.agg(
      count(lit(1)).as("total"),
      (count(lit(1)) - count(col("o_custkey"))).as("v_nn"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_uq"),
      notTrue(col("o_orderstatus").isin("F", "O", "P")).as("v_set"),
      notTrue(col("o_totalprice") > 0).as("v_pos"))
    val l = li.agg(
      count(lit(1)).as("total"),
      (count(lit(1)) - countDistinct(col("l_orderkey"))).as("v_uq1"),
      (count(lit(1)) -
        countDistinct(struct(col("l_orderkey"), col("l_linenumber"))))
        .as("v_uq2"),
      notTrue(col("l_quantity").between(1, 50)).as("v_rng"),
      notTrue(col("l_extendedprice") >= 0).as("v_neg"))
    val e = ev.agg(
      count(lit(1)).as("total"),
      (count(lit(1)) - count(col("props"))).as("v_nn"))
    val oRows = o.selectExpr(
      """stack(4,
        |  'not_null', 'orders.o_custkey',      total, v_nn,
        |  'unique',   'orders.o_orderkey',     total, v_uq,
        |  'in_set',   'orders.o_orderstatus',  total, v_set,
        |  'positive', 'orders.o_totalprice',   total, v_pos
        |) AS (check_name, target, total, violations)""".stripMargin)
    val lRows = l.selectExpr(
      """stack(4,
        |  'unique',       'lineitem.l_orderkey',                  total, v_uq1,
        |  'unique',       'lineitem.(l_orderkey,l_linenumber)',   total, v_uq2,
        |  'range_1_50',   'lineitem.l_quantity',                  total, v_rng,
        |  'non_negative', 'lineitem.l_extendedprice',             total, v_neg
        |) AS (check_name, target, total, violations)""".stripMargin)
    val eRows = e.selectExpr(
      """stack(1, 'not_null', 'events.props', total, v_nn)
        |  AS (check_name, target, total, violations)""".stripMargin)
    val fkRow = li.agg(count(lit(1)).as("total")).crossJoin(
      li.select(col("l_orderkey"))
        .join(orders.select(col("o_orderkey").as("l_orderkey")),
          Seq("l_orderkey"), "left_anti")
        .agg(count(lit(1)).as("violations")))
      .select(lit("fk").as("check_name"),
        lit("lineitem.l_orderkey->orders.o_orderkey").as("target"),
        col("total"), col("violations"))
    oRows.unionByName(lRows).unionByName(eRows).unionByName(fkRow)
      .withColumn("passed", col("violations") === 0L)
  }

  /** JOIN FANOUT PROFILE (extension, r17; a NEW planning-diagnostics
    * class — [[skewSaltedJoin]]'s sibling that MEASURES instead of
    * fixes: before committing a 100 TB fact⨝fact join, this is the
    * question you ask the data): for the orders⨝lineitem equi-key,
    * the joint multiplicity distribution — for every (left-side
    * multiplicity, right-side multiplicity) pair, how many join keys
    * have that shape and how many output rows they will produce
    * (`n_keys · ml · mr`). Dangling keys surface as the `(0, m)` /
    * `(m, 0)` rows (referential-integrity mass the join will DROP —
    * the row-count view of [[constraintSuite]]'s fk verdict); skew
    * surfaces as high-multiplicity rows carrying disproportionate
    * `join_output_rows` mass (the keys a salted join —
    * `skew_salted_join` — would split).
    *
    * 100-TB posture: both facts collapse to KEY GRAIN with map-side
    * combined counts BEFORE any join — the full-outer join runs on
    * |keys|-sized inputs, and the profile output is
    * multiplicity-pair-grain (dozens of rows at any corpus size).
    * This is exactly the cost asymmetry that makes the profile worth
    * running ahead of the real join. Exact integers throughout. */
  def fanoutProfile(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderkey").as("key")).agg(count(lit(1)).as("ml"))
    val l = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_orderkey").as("key")).agg(count(lit(1)).as("mr"))
    o.join(l, Seq("key"), "full_outer")
      .select(coalesce(col("ml"), lit(0L)).as("mult_orders"),
        coalesce(col("mr"), lit(0L)).as("mult_lineitem"))
      .groupBy("mult_orders", "mult_lineitem")
      .agg(count(lit(1)).as("n_keys"))
      .withColumn("join_output_rows",
        col("n_keys") * col("mult_orders") * col("mult_lineitem"))
  }

  /** Oracle for [[fanoutProfile]]. */
  val fanoutProfileSql: String =
    """WITH o AS (SELECT o_orderkey AS key, CAST(count(*) AS BIGINT) AS ml
      |           FROM orders GROUP BY 1),
      |     l AS (SELECT l_orderkey AS key, CAST(count(*) AS BIGINT) AS mr
      |           FROM lineitem GROUP BY 1),
      |     k AS (SELECT COALESCE(o.ml, 0) AS mult_orders,
      |                  COALESCE(l.mr, 0) AS mult_lineitem
      |           FROM o FULL OUTER JOIN l USING (key))
      |SELECT mult_orders, mult_lineitem,
      |       CAST(count(*) AS BIGINT) AS n_keys,
      |       CAST(count(*) * mult_orders * mult_lineitem AS BIGINT)
      |         AS join_output_rows
      |FROM k GROUP BY 1, 2""".stripMargin

  /** Oracle for [[constraintSuite]]: the same ten contract rows as
    * scalar aggregates (per-table single-pass CTEs + a NOT EXISTS for
    * the FK). */
  val constraintSuiteSql: String =
    """WITH o AS (
      |  SELECT count(*) AS total,
      |         count(*) - count(o_custkey) AS v_nn,
      |         count(*) - count(DISTINCT o_orderkey) AS v_uq,
      |         count(*) FILTER (WHERE o_orderstatus IS NULL
      |           OR o_orderstatus NOT IN ('F','O','P')) AS v_set,
      |         count(*) FILTER (WHERE o_totalprice IS NULL
      |           OR NOT (o_totalprice > 0)) AS v_pos
      |  FROM orders),
      |l AS (
      |  SELECT count(*) AS total,
      |         count(*) - count(DISTINCT l_orderkey) AS v_uq1,
      |         count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS v_uq2,
      |         count(*) FILTER (WHERE l_quantity IS NULL
      |           OR NOT (l_quantity BETWEEN 1 AND 50)) AS v_rng,
      |         count(*) FILTER (WHERE l_extendedprice IS NULL
      |           OR l_extendedprice < 0) AS v_neg
      |  FROM lineitem),
      |e AS (
      |  SELECT count(*) AS total, count(*) - count(props) AS v_nn
      |  FROM events),
      |f AS (
      |  SELECT (SELECT count(*) FROM lineitem) AS total,
      |         (SELECT count(*) FROM lineitem li WHERE NOT EXISTS
      |            (SELECT 1 FROM orders o2
      |             WHERE o2.o_orderkey = li.l_orderkey)) AS violations)
      |SELECT check_name, target, CAST(total AS BIGINT) AS total,
      |       CAST(violations AS BIGINT) AS violations,
      |       violations = 0 AS passed
      |FROM (
      |  SELECT 'not_null' AS check_name, 'orders.o_custkey' AS target,
      |         total, v_nn AS violations FROM o
      |  UNION ALL SELECT 'unique', 'orders.o_orderkey', total, v_uq FROM o
      |  UNION ALL SELECT 'in_set', 'orders.o_orderstatus', total, v_set FROM o
      |  UNION ALL SELECT 'positive', 'orders.o_totalprice', total, v_pos FROM o
      |  UNION ALL SELECT 'unique', 'lineitem.l_orderkey', total, v_uq1 FROM l
      |  UNION ALL SELECT 'unique', 'lineitem.(l_orderkey,l_linenumber)',
      |         total, v_uq2 FROM l
      |  UNION ALL SELECT 'range_1_50', 'lineitem.l_quantity', total, v_rng FROM l
      |  UNION ALL SELECT 'non_negative', 'lineitem.l_extendedprice',
      |         total, v_neg FROM l
      |  UNION ALL SELECT 'not_null', 'events.props', total, v_nn FROM e
      |  UNION ALL SELECT 'fk', 'lineitem.l_orderkey->orders.o_orderkey',
      |         total, violations FROM f
      |)""".stripMargin

  /** Bloom-filter bits per bucket word. */
  private val BloomBits = 1 << 20
  private val BloomSeeds = Seq(0x1234, 0x5678, 0x9abc, 0xdef0)

  /** Bloom membership test for `key` against `words` (an ArrayType(LONG)
    * literal of `BloomBits/64` words): k xxhash64 probes, each checking
    * one bit with dynamic shifts — built-in functions only, fully
    * whole-stage-codegen'd. No false negatives by construction. */
  private def bloomMightContain(key: Column, words: Column): Column =
    BloomSeeds.map { seed =>
      val pos = pmod(xxhash64(key, lit(seed)), lit(BloomBits.toLong))
      val word = element_at(words, (pos / 64L).cast("int") + 1)
      // dynamic shift amount needs the SQL-function form of shiftright
      call_function("shiftright", word, (pos % 64L).cast("int"))
        .bitwiseAND(lit(1L)) === 1L
    }.reduce(_ && _)

  /** Semi-join reduction via an explicit Bloom runtime filter — the
    * pattern that makes selective dim⨝fact joins survive 100 TB: the
    * filtered `orders` keys are folded into a 1 Mbit Bloom filter (a
    * 128 KB long-array literal, built with ONE distributed bit_or
    * aggregate and a 16 K-row collect), which prunes the `lineitem`
    * scan BEFORE the shuffle join. The exact semi-join still runs after
    * the probe, so Bloom false positives cannot leak into the result —
    * output is byte-identical to the plain semi-join the oracle runs.
    * Spark's AQE injects this automatically when statistics allow
    * (`spark.sql.optimizer.runtime.bloomFilter.enabled`); this form is
    * explicit and deterministic, sized m=2^20 for ~1.5M keys at 1% FP
    * (scale m with the build-side count at larger SFs). */
  def bloomSemiJoinRevenue(spark: SparkSession, dir: String): DataFrame = {
    val hot = Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    // build: key → k (word, bit) pairs → bit_or per word → tiny collect
    val wordsRows = hot
      .select(explode(array(BloomSeeds.map(seed =>
        pmod(xxhash64(col("o_orderkey"), lit(seed)),
          lit(BloomBits.toLong))): _*)).as("pos"))
      .select((col("pos") / 64L).cast("int").as("w"),
        call_function("shiftleft", lit(1L), (col("pos") % 64L).cast("int"))
          .as("bit"))
      .groupBy("w").agg(bit_or(col("bit")).as("word"))
      .collect()
    val words = Array.ofDim[Long](BloomBits / 64)
    wordsRows.foreach(r => words(r.getInt(0)) = r.getLong(1))

    val li = Tables.load(spark, dir, "lineitem")
      .filter(bloomMightContain(col("l_orderkey"), lit(words)))
    li.join(hot, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
        decD(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")))))
          .as("revenue"))
  }

  /** Oracle for [[bloomSemiJoinRevenue]] — the Bloom probe is a pure
    * pre-filter, so the oracle is the plain semi-join. */
  val bloomSemiJoinRevenueSql: String =
    """SELECT l_returnflag, count(*) AS n_lines,
      |       CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
      |                     AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0 AS revenue
      |FROM lineitem
      |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
      |                     WHERE o_orderpriority = '1-URGENT')
      |GROUP BY 1""".stripMargin

  /** Distributed exact rank (1-based) under `ORDER BY metric, key` —
    * the [[graft.ops.TradeOps.orderedSplit]] shape generalized: bucket
    * by a coarse non-decreasing function of the metric, per-bucket
    * counts broadcast back as prefix-sum offsets, then a per-bucket
    * `row_number`. The only global window runs over the tiny bucket
    * table (#buckets rows), so no single task ever sorts the full
    * input — the global-window rank this exists to avoid would.
    * Adds `_rank` and `_total`; `_bkt` must coarsen `metric` (equal
    * metric ⇒ equal bucket, metric order preserved across buckets). */
  private def distributedRank(df: DataFrame, bkt: Column,
      metric: Column, key: Column): DataFrame = {
    val bucketed = df.withColumn("_bkt", bkt)
    val counts = bucketed.groupBy("_bkt").agg(count(lit(1)).as("_n"))
    val prior = Window.orderBy("_bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = counts.select(col("_bkt"),
      coalesce(sum(col("_n")).over(prior), lit(0L)).as("_prior"),
      sum(col("_n")).over(all).as("_total"))
    val inBucket = Window.partitionBy("_bkt").orderBy(metric, key)
    bucketed.join(broadcast(offsets), "_bkt")
      .withColumn("_rank", col("_prior") + row_number().over(inBucket))
      .drop("_bkt", "_prior")
  }

  /** Exact long integer division. `Column./` is IEEE double division;
    * subtracting the remainder first makes the quotient an exactly
    * representable integer, so the double divide is exact (< 2^53). */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** SQL-standard NTILE from an exact rank: the first `n mod t` tiles
    * carry `ceil(n/t)` rows — pure integer arithmetic, so the Spark
    * side reproduces the oracle's `ntile(t)` without its global sort. */
  private def ntileOfRank(rank: Column, n: Column, t: Int): Column = {
    val size = idiv(n, lit(t.toLong))
    val rem = n % t
    val cut = rem * (size + 1L)
    when(rank <= cut, idiv(rank - 1L, size + 1L) + 1L)
      .otherwise(rem + idiv(rank - cut - 1L, size) + 1L)
  }

  /** Test hook: [[ntileOfRank]] applied to an explicit (rank, n)
    * table, so the arithmetic can be property-tested against Spark's
    * own `ntile` window. */
  private[graft] def ntileForTest(df: DataFrame, rank: Column, n: Column,
      t: Int): DataFrame =
    df.withColumn("tile", ntileOfRank(rank, n, t))

  /** RFM customer segmentation (extension) — the marketing-warehouse
    * classic: per customer recency (latest order date), frequency
    * (order count), monetary (exact-decimal lifetime spend), each
    * scored into quartiles (1 = best) and composed into the 3-digit
    * RFM segment.
    *
    * The naive form is three `ntile(4) OVER (ORDER BY …)` global
    * windows — a single-task full sort each, the exact shape
    * [[TextOps.vocabTopK]] refused. Here each quartile comes from
    * [[distributedRank]] + [[ntileOfRank]]: rank via coarse-bucket
    * prefix sums (recency buckets by month, frequency by its own small
    * value, monetary by $1k bands), tile by integer arithmetic — the
    * plan is three aggregate-sized shuffles and holds at any customer
    * cardinality. Ordering is total (metric DESC, custkey DESC via the
    * reversed ascending rank), so ties are engine-identical. */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(spark, dir, "orders")
      .groupBy(col("o_custkey").as("custkey"))
      .agg(max(col("o_orderdate")).as("recency"),
        count(lit(1)).as("frequency"),
        sum(dec(col("o_totalprice"))).as("_monetary"))
    // rank ascending by (metric, custkey); n+1-rank is then the rank
    // under (metric DESC, custkey DESC) — total order, no ties.
    // Each stage is localCheckpoint'ed: distributedRank reads its input
    // twice (bucketed rows + bucket counts), so an unmaterialized
    // 3-stage chain would re-run the orders aggregate 2^3 times.
    // Release discipline (Graph.connectedComponents): each stage's EAGER
    // checkpoint fully materializes from its predecessor's, so the
    // predecessor is dead weight the moment the next stage's checkpoint
    // exists — unpersist it then. Only the LAST checkpoint (which the
    // returned frame rests on) stays pinned.
    var prevCkpt: Seq[org.apache.spark.rdd.RDD[_]] = Nil
    def quartileDesc(df: DataFrame, bkt: Column, metric: Column,
        outCol: String): DataFrame = {
      val c = df.localCheckpoint() // eager: predecessor now released below
      prevCkpt.foreach(_.unpersist(blocking = false))
      prevCkpt = c.queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }
      distributedRank(c, bkt, metric, col("custkey"))
        .withColumn(outCol,
          ntileOfRank(col("_total") + 1L - col("_rank"), col("_total"), 4))
        .drop("_rank", "_total")
    }
    val r = quartileDesc(base, date_trunc("month", col("recency")),
      col("recency"), "r_q")
    val f = quartileDesc(r, col("frequency"), col("frequency"), "f_q")
    val m = quartileDesc(f, floor(col("_monetary") / 1000L),
      col("_monetary"), "m_q")
    m.select(col("custkey"), col("recency"), col("frequency"),
      decD(col("_monetary")).as("monetary"),
      col("r_q"), col("f_q"), col("m_q"),
      (col("r_q") * 100L + col("f_q") * 10L + col("m_q")).as("rfm_segment"))
  }

  /** Oracle for [[rfmSegments]] — the textbook triple-ntile form the
    * Spark side deliberately avoids executing. */
  val rfmSegmentsSql: String =
    """WITH base AS (
      |  SELECT o_custkey AS custkey, max(o_orderdate) AS recency,
      |         count(*) AS frequency,
      |         sum(CAST(o_totalprice AS DECIMAL(18,6))) AS monetary
      |  FROM orders GROUP BY 1
      |)
      |SELECT custkey, recency, frequency, CAST(CAST(monetary * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0 AS monetary,
      |       CAST(ntile(4) OVER (ORDER BY recency DESC, custkey DESC)
      |            AS BIGINT) AS r_q,
      |       CAST(ntile(4) OVER (ORDER BY frequency DESC, custkey DESC)
      |            AS BIGINT) AS f_q,
      |       CAST(ntile(4) OVER (ORDER BY monetary DESC, custkey DESC)
      |            AS BIGINT) AS m_q,
      |       CAST(ntile(4) OVER (ORDER BY recency DESC, custkey DESC) * 100
      |          + ntile(4) OVER (ORDER BY frequency DESC, custkey DESC) * 10
      |          + ntile(4) OVER (ORDER BY monetary DESC, custkey DESC)
      |            AS BIGINT) AS rfm_segment
      |FROM base""".stripMargin

  /** Year-over-year monthly revenue growth (extension) — monthly
    * exact-decimal revenue self-joined to the same month one year
    * earlier (the join form: a `lag(12)` ordinal window would silently
    * pair across gaps if a month were empty, and needs a global sort
    * besides). Post-aggregation cardinality is #months — bounded at any
    * fact-table size, so the join is trivially broadcast. */
  def yoyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.load(spark, dir, "orders")
      .groupBy(year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"))
      .agg(sum(dec(col("o_totalprice"))).as("rev"))
    val prev = monthly.select((col("y") + 1L).as("y"), col("m"),
      col("rev").as("prev_rev"))
    monthly.join(broadcast(prev), Seq("y", "m"), "left")
      .select(col("y"), col("m"),
        decD(col("rev")).as("revenue"),
        decD(col("prev_rev")).as("prev_revenue"),
        round((decD(col("rev")) - decD(col("prev_rev")))
          / decD(col("prev_rev")) * 100d, 4).as("yoy_pct"))
  }

  /** Oracle for [[yoyRevenue]] — same join form, same cast points. */
  val yoyRevenueSql: String =
    """WITH monthly AS (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
      |         CAST(month(o_orderdate) AS BIGINT) AS m,
      |         sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
      |  FROM orders GROUP BY 1, 2
      |)
      |SELECT c.y, c.m, CAST(CAST(c.rev * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0 AS revenue,
      |       CAST(CAST(p.rev * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0 AS prev_revenue,
      |       round((CAST(CAST(c.rev * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0 - CAST(CAST(p.rev * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0)
      |             / (CAST(CAST(p.rev * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0) * 100, 4) AS yoy_pct
      |FROM monthly c LEFT JOIN monthly p ON p.y = c.y - 1 AND p.m = c.m""".stripMargin

  /** Q25 analog (extension) — market-basket co-purchase affinity: for
    * part pairs ordered together in ≥ `minSupport` orders, the lift
    * `N·c_ab/(c_a·c_b)` (>1 ⇔ the pair co-occurs more than chance).
    * The self-join explodes per ORDER — pairs per order are bounded by
    * lines-per-order² (single digits in this schema), so the blowup is
    * group-bounded like [[graft.ops.EventAnalytics.transitionMatrix]],
    * never corpus². Distinct (order, part) first so duplicate lines of
    * the same part can't inflate support; all counts exact, lift is
    * one fixed double expression over exact integers. */
  def copurchase(spark: SparkSession, dir: String,
      minSupport: Long = 3L): DataFrame = {
    // r17: op feeds four consumers (the self-join's two sides, the part
    // counts, the order count) — materialize the 2-column distinct once
    // (guide §2.4; the tokenBudget release-exemption shape) instead of
    // re-running the scan+distinct per reference.
    val op = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .localCheckpoint()
    val nOrders = op.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val partCnt = op.groupBy("l_partkey").agg(count(lit(1)).as("cp"))
    val pairs = op.select(col("l_orderkey"), col("l_partkey").as("part_a"))
      .join(op.select(col("l_orderkey"), col("l_partkey").as("part_b")),
        "l_orderkey")
      .filter(col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b").agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minSupport)
    pairs
      .join(broadcast(partCnt.withColumnRenamed("l_partkey", "part_a")
        .withColumnRenamed("cp", "ca")), "part_a")
      .join(broadcast(partCnt.withColumnRenamed("l_partkey", "part_b")
        .withColumnRenamed("cp", "cb")), "part_b")
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("n_both"),
        ((col("n_both") * col("n_orders")).cast("double")
          / (col("ca") * col("cb")).cast("double")).as("lift"))
  }

  /** Oracle for [[copurchase]]. */
  def copurchaseSql(minSupport: Long = 3L): String =
    s"""WITH op AS (
       |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
       |), n AS (
       |  SELECT count(DISTINCT l_orderkey) AS n_orders FROM op
       |), pc AS (
       |  SELECT l_partkey, count(*) AS cp FROM op GROUP BY 1
       |), pr AS (
       |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       |         count(*) AS n_both
       |  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
       |   AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2 HAVING count(*) >= $minSupport
       |)
       |SELECT pr.part_a, pr.part_b, pr.n_both,
       |       (CAST(pr.n_both * n.n_orders AS DOUBLE)
       |             / CAST(ca.cp * cb.cp AS DOUBLE)) AS lift
       |FROM pr JOIN pc ca ON ca.l_partkey = pr.part_a
       |        JOIN pc cb ON cb.l_partkey = pr.part_b
       |        CROSS JOIN n""".stripMargin

  /** Q26 (extension) — customer revenue decile report: the
    * concentration table every revenue review opens with ("the top
    * decile is X% of revenue"). Per-customer order totals in exact
    * DECIMAL(18,2) cents (`o_totalprice` is 2-decimal by TPC-H
    * construction — the money-sum discipline), ntile(10) over
    * (total, custkey) — deterministic tie-break — then per-decile
    * count/sum/min/max and the revenue share in exact ppm. The global
    * ntile window runs over the AGGREGATED customer table (1000×
    * smaller than orders; at 100 TB swap in the two-phase
    * range-partition rank — [[graft.ops.Pipeline.shardPlan]]). */
  def revenueDeciles(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.load(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,2))")).as("rev"))
    val w = Window.orderBy(col("rev"), col("o_custkey"))
    val dec = per.withColumn("decile", ntile(10).over(w).cast("long"))
    val tot = dec.agg(sum(expr("CAST(rev * 100 AS BIGINT)")).as("t"))
    dec
      .groupBy("decile")
      .agg(count(lit(1)).as("n_customers"),
        sum(expr("CAST(rev * 100 AS BIGINT)")).as("rev_cents"),
        min(expr("CAST(rev * 100 AS BIGINT)")).as("min_cents"),
        max(expr("CAST(rev * 100 AS BIGINT)")).as("max_cents"))
      .crossJoin(broadcast(tot))
      // overflow-free exact ppm (r17 sf10 rehearsal catch: at the 100x
      // corpus a decile's rev_cents exceeds 2^63/10^6 and the naive
      // multiply overflows — loudly under ANSI Spark, silently-wide
      // under DuckDB HUGEINT, the asymmetric-loudness class). Below
      // the ceiling the multiply is provably safe (rev_cents <= t);
      // above it the divisor-side floor form pays <= 1 ppm of rounding
      // for overflow-freedom at ANY corpus size. Same CASE in the
      // oracle -> engine-identical either way.
      .withColumn("share_ppm", expr(
        """CASE WHEN t <= 9223372036854
          |THEN (rev_cents * 1000000) div t
          |ELSE rev_cents div (t div 1000000) END""".stripMargin))
      .drop("t")
  }

  /** Oracle for [[revenueDeciles]]. */
  val revenueDecilesSql: String =
    """WITH per AS (
      |  SELECT o_custkey,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |           AS DECIMAL(18,2)) AS rev
      |  FROM orders GROUP BY 1
      |), dec AS (
      |  SELECT o_custkey, rev,
      |         CAST(ntile(10) OVER (ORDER BY rev, o_custkey) AS BIGINT)
      |           AS decile
      |  FROM per
      |), t AS (
      |  SELECT CAST(sum(CAST(rev * 100 AS BIGINT)) AS BIGINT) AS t FROM dec
      |)
      |SELECT decile, count(*) AS n_customers,
      |       CAST(sum(CAST(rev * 100 AS BIGINT)) AS BIGINT) AS rev_cents,
      |       min(CAST(rev * 100 AS BIGINT)) AS min_cents,
      |       max(CAST(rev * 100 AS BIGINT)) AS max_cents,
      |       CASE WHEN (SELECT t FROM t) <= 9223372036854
      |       THEN (CAST(sum(CAST(rev * 100 AS BIGINT)) AS BIGINT) * 1000000)
      |            // (SELECT t FROM t)
      |       ELSE CAST(sum(CAST(rev * 100 AS BIGINT)) AS BIGINT)
      |            // ((SELECT t FROM t) // 1000000) END AS share_ppm
      |FROM dec GROUP BY 1""".stripMargin

  /** Q28 (extension) — ship-latency profile: the order-to-ship delay
    * distribution per order priority, bucketed by week — the SLA
    * question ("do urgent orders actually ship faster, and where is
    * the tail?") behind every fulfillment review. ENTIRELY integer:
    * latency in exact epoch-µs-derived days (`div 86400000000` —
    * Spark `div` ≡ DuckDB `//` truncation), weeks by `div 7`. The
    * orderkey join is the one heavy stage — two large sides,
    * sort-merge co-partitionable (bucket both by orderkey at the
    * lakehouse layer and it is shuffle-free); the histogram then
    * map-side combines to priorities × weeks rows. */
  def shipLatency(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .withColumn("lat_days", expr(
        "(unix_micros(CAST(l_shipdate AS TIMESTAMP)) - " +
          "unix_micros(CAST(o_orderdate AS TIMESTAMP))) div 86400000000"))
      .withColumn("lat_wk", expr("lat_days div 7"))
      .groupBy("o_orderpriority", "lat_wk")
      .agg(count(lit(1)).as("n_lines"),
        min(col("lat_days")).as("min_days"),
        max(col("lat_days")).as("max_days"))
  }

  /** Oracle for [[shipLatency]]. */
  val shipLatencySql: String =
    """SELECT o_orderpriority, lat_days // 7 AS lat_wk, count(*) AS n_lines,
      |       min(lat_days) AS min_days, max(lat_days) AS max_days
      |FROM (
      |  SELECT o.o_orderpriority,
      |         (epoch_us(l.l_shipdate::TIMESTAMP)
      |          - epoch_us(o.o_orderdate::TIMESTAMP)) // 86400000000
      |           AS lat_days
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |)
      |GROUP BY 1, 2""".stripMargin

  /** Q29 (extension) — re-order cadence histogram: days between a
    * customer's consecutive orders, week-bucketed corpus-wide — the
    * purchase-frequency shape behind retention/LTV models
    * (complementing the per-user [[graft.ops.EventAnalytics.rfm]]
    * tier with the order-table truth). One customer-keyed ordered
    * window (high-cardinality key — no hot reducer), then a map-side-
    * combined global histogram; Σgap telescopes per customer to
    * first-to-last span, so sums stay BIGINT-exact. */
  def orderGapHist(spark: SparkSession, dir: String): DataFrame = {
    val byCust = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.load(spark, dir, "orders")
      .withColumn("us", expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))"))
      .withColumn("prev", lag(col("us"), 1).over(byCust))
      .filter(col("prev").isNotNull)
      .withColumn("gap_days", expr("(us - prev) div 86400000000"))
      .withColumn("gap_wk", expr("gap_days div 7"))
      .groupBy("gap_wk")
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap_days")).as("min_days"),
        max(col("gap_days")).as("max_days"),
        sum(col("gap_days")).as("sum_days"))
  }

  /** Oracle for [[orderGapHist]]. */
  val orderGapHistSql: String =
    """WITH g AS (
      |  SELECT (us - lag(us, 1) OVER (PARTITION BY o_custkey
      |            ORDER BY o_orderdate, o_orderkey)) // 86400000000
      |           AS gap_days
      |  FROM (SELECT o_custkey, o_orderdate, o_orderkey,
      |               epoch_us(o_orderdate::TIMESTAMP) AS us
      |        FROM orders)
      |)
      |SELECT gap_days // 7 AS gap_wk, count(*) AS n_gaps,
      |       min(gap_days) AS min_days, max(gap_days) AS max_days,
      |       CAST(sum(gap_days) AS BIGINT) AS sum_days
      |FROM g WHERE gap_days IS NOT NULL
      |GROUP BY 1""".stripMargin

  /** Q30 (extension) — supplier revenue concentration per nation: the
    * Herfindahl–Hirschman index every procurement/antitrust review
    * opens with ("is this nation's supply one mega-supplier or a
    * healthy long tail?"). ENTIRELY integer after the decimal revenue
    * sums: per-(nation, supplier) revenue in exact micro BIGINT (loud
    * past the [[graft.Num.decD]] ceiling via the same div-form
    * assert), shares in exact floored ppm of the nation total
    * (`rev_micro div (nation_micro div 1e6)` — the division order
    * keeps every intermediate in int64; the ≤1-ppm-per-supplier floor
    * loss is part of the statistic's definition here, identically in
    * both engines), HHI = Σ share² div 1e6 ∈ [0, 1e6] ppm.
    *
    * Scale shape: ONE lineitem-scale aggregate (nation×supplier keys),
    * then all remaining algebra on the supplier-cardinality table —
    * the nation total is a window over it, never a fact re-scan. */
  def supplierHhi(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val suppNat = Tables.load(spark, dir, "supplier")
      .join(broadcast(Tables.load(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val perSupp = li
      .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name"), col("l_suppkey"))
      .agg(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("rev_dec"))
      .filter(expr(
        "assert_true(abs(rev_dec) <= 9223372036854775807 div 1000000, " +
          "'supplier_hhi: per-supplier revenue exceeds the exact " +
          "micro-BIGINT range') IS NULL"))
      .withColumn("rev_micro", (col("rev_dec") * lit(1000000)).cast("long"))
    val byNation = Window.partitionBy("n_name")
    perSupp
      // the NATION total gets its own loud ceiling: summed as exact
      // DECIMAL (Spark widens the window sum's precision — cannot
      // wrap), asserted into the micro-BIGINT range, THEN cast. A
      // sum(rev_micro-as-long) window would wrap silently past
      // ~9.2e12 total units while DuckDB's HUGEINT widening sails on —
      // the silent-divergence class this repo guards (ADVICE r13).
      .withColumn("nation_dec", sum(col("rev_dec")).over(byNation))
      .filter(expr(
        "assert_true(abs(nation_dec) <= 9223372036854775807 div 1000000, " +
          "'supplier_hhi: nation revenue total exceeds the exact " +
          "micro-BIGINT range') IS NULL"))
      .withColumn("nation_micro", (col("nation_dec") * lit(1000000)).cast("long"))
      // tiny-nation clamp: with total revenue under 2 units the floored
      // ppm denominator (greatest(total div 1e6, 1)) understates the
      // total and a share could exceed 1e6 ppm — clamp share and HHI to
      // the documented [0, 1e6] range, identically in the oracle.
      .withColumn("share_ppm", expr(
        "least(rev_micro div greatest(nation_micro div 1000000, 1), " +
          "1000000)"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_suppliers"),
        // nation_micro IS the exact micro value — one IEEE long→double
        // cast + exact power-of-ten divide (the decD route, inlined)
        (max(col("nation_micro")).cast("double") / lit(1000000d))
          .as("nation_revenue"),
        max(col("share_ppm")).as("top_share_ppm"),
        expr("least(sum(share_ppm * share_ppm) div 1000000, 1000000)")
          .as("hhi_ppm"))
  }

  /** Oracle for [[supplierHhi]]. */
  val supplierHhiSql: String =
    """WITH ps AS (
      |  SELECT n_name, l_suppkey,
      |         CAST(sum(CAST(l_extendedprice * (1 - l_discount)
      |                       AS DECIMAL(18,6))) * 1000000 AS BIGINT)
      |           AS rev_micro
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  GROUP BY 1, 2
      |), sh AS (
      |  SELECT n_name, rev_micro,
      |         CAST(sum(rev_micro) OVER (PARTITION BY n_name) AS BIGINT)
      |           AS nation_micro,
      |         least(CAST(rev_micro // greatest(
      |           (sum(rev_micro) OVER (PARTITION BY n_name)) // 1000000,
      |           1) AS BIGINT), 1000000) AS share_ppm
      |  FROM ps
      |)
      |SELECT n_name, count(*) AS n_suppliers,
      |       CAST(max(nation_micro) AS DOUBLE) / 1000000.0
      |         AS nation_revenue,
      |       max(share_ppm) AS top_share_ppm,
      |       least(CAST(sum(share_ppm * share_ppm) AS BIGINT) // 1000000,
      |             1000000) AS hhi_ppm
      |FROM sh GROUP BY 1""".stripMargin

  /** Q31 (extension) — customer revenue-decile migration: the
    * year-over-year mobility matrix behind every retention review
    * ("do top-decile customers stay on top?"). Per-(customer, year)
    * revenue in exact DECIMAL(18,2) cents, decile = ntile(10) over
    * (rev, custkey) WITHIN each year (deterministic tie-break; the
    * global window runs over the aggregated customer×year table —
    * orders-of-magnitude smaller than the fact table, the q26
    * convention), then a LEFT self-join to the next year: customers
    * absent next year land in `to_decile = 0` (the churn row), so
    * every (year, from_decile) fan-in telescopes to that decile's
    * population. Output is years × 10 × 11 rows — bounded at any
    * corpus size.
    *
    * SCALE CLIFF (noted per ADVICE r13): `ntile(10) OVER (PARTITION BY
    * year)` sorts one year's whole customer population on a single
    * reducer. Mitigated here by ranking the post-aggregation
    * customer×year table (|customers|, not |orders|), but if customer
    * cardinality grows with the corpus this op switches to the
    * [[graft.ops.TradeOps.volRegimeBanded]] two-pass banded rank — the
    * bucket-offset form that assembles the same exact ntile without a
    * single-partition sort. */
  def decileMigration(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.load(spark, dir, "orders")
      .groupBy(col("o_custkey").as("custkey"),
        year(col("o_orderdate")).cast("long").as("y"))
      .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,2))")).as("rev"))
    val w = Window.partitionBy("y").orderBy(col("rev"), col("custkey"))
    val dec = per.select(col("custkey"), col("y"),
      ntile(10).over(w).cast("long").as("d"))
    val nxt = dec.select(col("custkey"), (col("y") - 1L).as("y"),
      col("d").as("to_decile"))
    dec.join(nxt, Seq("custkey", "y"), "left")
      .groupBy(col("y").as("from_year"),
        col("d").as("from_decile"),
        coalesce(col("to_decile"), lit(0L)).as("to_decile"))
      .agg(count(lit(1)).as("n_customers"))
  }

  /** Oracle for [[decileMigration]]. */
  val decileMigrationSql: String =
    """WITH per AS (
      |  SELECT o_custkey AS custkey,
      |         CAST(year(o_orderdate) AS BIGINT) AS y,
      |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY 1, 2
      |), dec AS (
      |  SELECT custkey, y,
      |         CAST(ntile(10) OVER (PARTITION BY y
      |           ORDER BY rev, custkey) AS BIGINT) AS d
      |  FROM per
      |)
      |SELECT c.y AS from_year, c.d AS from_decile,
      |       COALESCE(n.d, 0) AS to_decile,
      |       count(*) AS n_customers
      |FROM dec c LEFT JOIN dec n
      |  ON n.custkey = c.custkey AND n.y = c.y + 1
      |GROUP BY 1, 2, 3""".stripMargin
}
