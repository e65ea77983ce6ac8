package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composite training-data pipeline (SURVEY.md §7.5): the canonical
  * corpus-cleaning pass an LLM data pipeline runs end to end —
  *
  *   1. quality-score every document ([[TextOps.qualityScore]]) and drop
  *      the low-quality tail;
  *   2. near-dup group the SURVIVORS (MinHash LSH pairs → connected
  *      components, [[Dedup.resolveDuplicates]]);
  *   3. keep one canonical doc per duplicate cluster (lowest doc_id).
  *
  * Output: the cleaned corpus manifest — one row per kept doc with its
  * lang/source, token count, quality, and how many near-dups it
  * absorbed. Every stage is the already-scale-shaped operator it
  * composes; the extra joins here are label-space small and
  * AQE-broadcast. Filtering BEFORE dedup is deliberate (and the cheaper
  * order): the pair graph is built only over surviving docs.
  */
object Pipeline {

  /** Quality cutoff (compared on the round-6 score, identically in both
    * engines); ~the corpus median on the synthetic tables (sf0.01
    * quantiles: p25 0.41, p50 0.42, p75 0.45), so the filter
    * meaningfully splits. */
  val minQuality = 0.42

  def corpusClean(docs: DataFrame): DataFrame = {
    val q = TextOps.qualityScore(docs)
      .select(col("doc_id"), col("n_tokens"), col("quality"))
    val keptIds = q.filter(col("quality") >= minQuality).select("doc_id")
    // Reuse the session-cached full-corpus SIGNATURE table
    // ([[Dedup.minhashSignatures]]) restricted to surviving docs — a
    // doc's signature doesn't depend on the rest of the corpus, so
    // sig(kept) is a semi-join away and the signature + explode stage is
    // never recomputed — then resolve through the same signature-group
    // contraction as [[Dedup.resolveDuplicates]].
    val sigKept = Dedup.minhashSignatures(docs)
      .join(keptIds, Seq("doc_id"), "left_semi")
    val resolved = Dedup.resolveBySignature(sigKept)
    resolved
      .filter(col("doc_id") === col("canonical_doc"))
      .select(col("doc_id"), col("cluster_size"))
      .join(docs.select(col("doc_id"), col("lang"), col("source")), "doc_id")
      .join(q, "doc_id")
      .select(col("doc_id"), col("lang"), col("source"), col("n_tokens"),
        col("quality"), col("cluster_size"))
  }

  val corpusCleanSql: String =
    s"""WITH RECURSIVE ${TextOps.qualityCte},
       |corpus AS (
       |  SELECT d.* FROM documents d JOIN q USING (doc_id)
       |  WHERE q.quality >= $minQuality
       |),
       |${Dedup.resolveCtesFrom("corpus")}
       |SELECT r.doc_id, d.lang, d.source, q.n_tokens, q.quality,
       |       s.cluster_size
       |FROM resolved r
       |JOIN sizes s USING (canonical_doc)
       |JOIN documents d USING (doc_id)
       |JOIN q USING (doc_id)
       |WHERE r.doc_id = r.canonical_doc""".stripMargin

  /** The pretraining-data pipeline end to end — what actually runs
    * between a raw crawl and a training job, as ONE composed plan:
    *
    *   1. quality-filter the corpus ([[TextOps.qualityScore]] ≥
    *      [[minQuality]] — filter FIRST, so every later stage works on
    *      survivors only);
    *   2. cross-document segment dedup of the survivors
    *      ([[TextOps.segmentDedup]]), dropping docs whose every segment
    *      was a repeat;
    *   3. greedy fixed-capacity sequence packing of the cleaned text
    *      ([[TextOps.packSequences]]).
    *
    * Output: the training-shard manifest — per (shard, sequence):
    * packed doc count, token count, doc-id span. Every stage is the
    * already-scale-shaped operator it composes; nothing here adds a
    * shuffle beyond the stages' own. */
  def pretrainManifest(docs: DataFrame): DataFrame = {
    val kept = TextOps.qualityScore(docs)
      .filter(col("quality") >= minQuality).select("doc_id")
    val cleaned = TextOps.segmentDedup(docs.join(kept, Seq("doc_id"), "left_semi"))
      .filter(col("n_kept") > 0)
      .select(col("doc_id"), col("clean_text").as("text"))
    TextOps.packSequences(cleaned)
  }

  /** Oracle for [[pretrainManifest]]: the three stages' CTE chains
    * composed — quality filter → segment dedup (over `corpus`) →
    * recursive greedy packing (over `cleaned`). */
  val pretrainManifestSql: String =
    s"""WITH RECURSIVE ${TextOps.qualityCte},
       |corpus AS (
       |  SELECT d.* FROM documents d JOIN q USING (doc_id)
       |  WHERE q.quality >= $minQuality
       |),
       |${TextOps.segmentCtesFrom("corpus")},
       |cleaned AS (
       |  SELECT doc_id,
       |         string_agg(CASE WHEN rn = 1 THEN seg_text END,
       |                    ' ' ORDER BY seg_pos) AS text
       |  FROM f GROUP BY 1
       |  HAVING sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) > 0
       |),
       |${TextOps.packCtesFrom("cleaned")}
       |${TextOps.packSelect}""".stripMargin

  /** The curation front-end composed: quality filter → transitive
    * decontamination ([[Graph.hopDistance]] over the MinHash graph,
    * dropping everything within 2 near-dup hops of a verbatim
    * contamination flag) → per-source quota ranked among SURVIVORS
    * (rank after filtering, so a source's slots go to clean docs).
    * Output: the curated manifest (doc_id, source, quality,
    * rank_in_source). Each stage is the already-scale-shaped operator
    * it composes; the taint set joins as a doc-keyed anti-join. */
  def curationManifest(docs: DataFrame, quota: Int = 50): DataFrame = {
    val base = docs.select(col("doc_id"), col("source"))
      .join(TextOps.qualityScore(docs).select(col("doc_id"), col("quality")),
        "doc_id")
      .filter(col("quality") >= minQuality)
    val tainted = Graph.hopDistance(
      docs.select("doc_id"),
      Dedup.dupEdges(docs),
      TextOps.contamination(docs)
        .filter(col("contaminated") === 1).select("doc_id"),
      // dupEdges is session-checkpointed; skip the duplicate pin
      assumeMaterialized = true)
      .filter(col("hop_dist").isNotNull).select("doc_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(col("quality").desc, col("doc_id"))
    base.join(tainted, Seq("doc_id"), "left_anti")
      .withColumn("rank_in_source", row_number().over(w).cast("long"))
      .filter(col("rank_in_source") <= quota)
  }

  /** Oracle for [[curationManifest]]: quality CTE + the shared
    * contamination-hops chain + anti-join + windowed quota. */
  def curationManifestSql(quota: Int = 50): String =
    s"""WITH ${TextOps.qualityCte},
       |${Dedup.contaminationHopsCtes()},
       |base AS (
       |  SELECT q.doc_id, d.source, q.quality
       |  FROM q JOIN documents d USING (doc_id)
       |  WHERE q.quality >= $minQuality
       |),
       |taint AS (SELECT id AS doc_id FROM d2 WHERE d IS NOT NULL),
       |clean AS (
       |  SELECT b.* FROM base b LEFT JOIN taint t USING (doc_id)
       |  WHERE t.doc_id IS NULL
       |),
       |ranked AS (
       |  SELECT doc_id, source, quality,
       |         row_number() OVER (PARTITION BY source
       |                            ORDER BY quality DESC, doc_id) AS rn
       |  FROM clean
       |)
       |SELECT doc_id, source, quality, CAST(rn AS BIGINT) AS rank_in_source
       |FROM ranked WHERE rn <= $quota""".stripMargin

  /** Filter funnel (extension) — the cleaning pipeline's observability
    * row: how many documents survive each stage (raw → quality →
    * exact-dedup → near-dedup). The numbers a data curator reads before
    * trusting a corpus build; "no silent caps" as a query. Stage 2/3
    * reuse the session-cached signature table and the same contraction
    * as [[corpusClean]], so the funnel costs one extra count per stage,
    * not a pipeline re-run. */
  def filterFunnel(docs: DataFrame): DataFrame = {
    val kept = TextOps.qualityScore(docs)
      .filter(col("quality") >= minQuality).select("doc_id")
    val corpus = docs.join(kept, Seq("doc_id"), "left_semi")
    val sigKept = Dedup.minhashSignatures(docs)
      .join(kept, Seq("doc_id"), "left_semi")
    val resolved = Dedup.resolveBySignature(sigKept)
    def stage(i: Int, name: String, d: DataFrame): DataFrame =
      d.agg(count(lit(1)).as("n_docs"))
        .select(lit(i.toLong).as("stage_idx"), lit(name).as("stage"),
          col("n_docs"))
    stage(0, "raw", docs)
      .unionByName(stage(1, "quality", corpus))
      .unionByName(stage(2, "exact_dedup",
        corpus.select(md5(col("text")).as("fp")).distinct()))
      .unionByName(stage(3, "near_dedup",
        resolved.filter(col("doc_id") === col("canonical_doc"))))
  }

  /** Leakage-safe train/test split: assign every document to a side by
    * its DUPLICATE CLUSTER, not by the document itself — hashing the
    * cluster's canonical id means near-identical copies can never
    * straddle train and test, the contamination mode that silently
    * inflates every eval metric when a 100-TB crawl (where the same page
    * appears thousands of times) is split row-wise. The split hash is
    * the engine-shared salted md5 (the [[Dedup]] discipline), so
    * assignment is deterministic and identical cross-engine; `testMod`
    * = 5 puts ~1/5 of CLUSTERS (not docs — a giant dup cluster moves as
    * one unit, which is the point) in test. One label join on top of
    * [[Dedup.resolveDuplicates]]; nothing here touches pair space. */
  def leakageSafeSplit(docs: DataFrame, testMod: Int = 5): DataFrame =
    Dedup.resolveDuplicates(docs)
      .withColumn("bucket", pmod(expr(
        "CAST(conv(substring(md5(CAST(canonical_doc AS STRING)), 1, 8), " +
          "16, 10) AS BIGINT)"), lit(testMod.toLong)))
      .select(col("doc_id"), col("canonical_doc"), col("cluster_size"),
        when(col("bucket") === 0L, lit("test")).otherwise(lit("train"))
          .as("split"))

  /** Oracle for [[leakageSafeSplit]] — same resolution closure, same
    * salted hash. A cluster straddling the sides is impossible by
    * construction in BOTH engines, so the hash compare pins it. */
  def leakageSafeSplitSql(testMod: Int = 5): String =
    s"""WITH RECURSIVE ${Dedup.resolveCtesFrom("documents")}
       |SELECT r.doc_id, r.canonical_doc, s.cluster_size,
       |       CASE WHEN ('0x' || substr(md5(CAST(r.canonical_doc AS VARCHAR)),
       |                  1, 8))::BIGINT % $testMod = 0
       |            THEN 'test' ELSE 'train' END AS split
       |FROM resolved r JOIN sizes s USING (canonical_doc)""".stripMargin

  /** Token-budget prefix selection — "fill the training budget with the
    * best data": walk the corpus in (quality desc, doc_id) order and
    * keep documents while the running token total stays within
    * `budget`. The cumulative sum is NOT a global window sort (that
    * would funnel 100 TB through one task) — it is the textbook
    * distributed prefix-sum: range-partition on the FULL sort key
    * (`repartitionByRange(quality desc, doc_id)` — the same sampled
    * range partitioner Spark's own global orderBy uses; because the
    * unique `doc_id` is part of the key, the sampler splits even an
    * exact-quality tie pile across partitions, so NO input
    * distribution can produce a hot partition), take per-partition
    * token totals (≤ shuffle-partition-count rows), prefix-sum those
    * on the driver-adjacent single-partition window, broadcast the
    * offsets back, and run the exact cumsum per partition in residual
    * (quality desc, doc_id) order. Offsets compose into the global
    * cumsum wherever the sampled boundaries happen to land, so the
    * output is boundary-independent. Partition ids are pinned by a
    * `localCheckpoint` (release exemption: a 3-narrow-column
    * projection of the corpus backing both the offsets pass and the
    * returned view — the materialization any distributed sort pays),
    * because the two consumers must observe identical sampled
    * boundaries. Token counts are exact BIGINTs, so the kept-set
    * boundary is engine-portable. */
  def tokenBudgetSelect(docs: DataFrame, budget: Long = 20000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranged = TextOps.qualityScore(docs)
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        col("quality"))
      .repartitionByRange(col("quality").desc, col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val wOff = Window.orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // ≤ shuffle-partition-count rows: the per-partition total table the
    // single-partition window runs over
    val offsets = ranged.groupBy("pid").agg(sum(col("n_tokens")).as("pt"))
      .withColumn("offset", coalesce(sum(col("pt")).over(wOff), lit(0L)))
      .select("pid", "offset")
    val wIn = Window.partitionBy("pid")
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(broadcast(offsets), "pid")
      .withColumn("cum_tokens", col("offset") + sum(col("n_tokens")).over(wIn))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("quality"), col("n_tokens"),
        col("cum_tokens"))
  }

  /** Oracle for [[tokenBudgetSelect]]: the straight global-window form
    * — equal to the two-phase plan because the bucket key is monotone
    * in the sort key. */
  def tokenBudgetSelectSql(budget: Long = 20000L): String =
    s"""WITH ${TextOps.qualityCte},
       |cum AS (
       |  SELECT doc_id, quality, CAST(n_tokens AS BIGINT) AS n_tokens,
       |         sum(CAST(n_tokens AS BIGINT)) OVER (
       |           ORDER BY quality DESC, doc_id
       |           ROWS UNBOUNDED PRECEDING) AS cum_tokens
       |  FROM q
       |)
       |SELECT doc_id, quality, n_tokens,
       |       CAST(cum_tokens AS BIGINT) AS cum_tokens
       |FROM cum WHERE cum_tokens <= $budget""".stripMargin

  /** Temperature-scaled source-mixture planning (the multilingual /
    * multi-source sampling-rate op): given per-language token mass
    * `n_i`, sample language i with probability ∝ (n_i/N)^α — upweight
    * the tail so low-resource languages aren't drowned, the standard
    * pretraining-mixture move. α is FIXED at 0.5 because IEEE sqrt is
    * correctly rounded (bit-identical in any engine) while pow is not;
    * the sqrt output is immediately micro-quantized to a BIGINT and
    * every downstream step (normalization, target-token allocation,
    * epoch factor) is exact integer arithmetic — so the emitted plan
    * is engine-portable to the last digit. `epochs_micro > 1e6` flags
    * languages the budget forces to repeat (oversampled), the signal
    * mixture reviews watch.
    *
    * Scale shape: one partial-aggregated groupBy(lang) over the
    * corpus, then all planning math on the ≤|langs|-row table with the
    * scalar total broadcast — nothing after the first aggregate
    * touches corpus-sized data. */
  def mixtureEpochs(docs: DataFrame, budget: Long = 50000L): DataFrame = {
    val byLang = docs
      .select(col("lang"), size(split(col("text"), " ")).cast("long")
        .as("n_tokens"))
      .groupBy("lang").agg(sum(col("n_tokens")).as("lang_tokens"))
    val total = byLang.agg(sum(col("lang_tokens")).as("total_tokens"))
    val scaled = byLang.crossJoin(broadcast(total))
      .withColumn("s_micro",
        expr("CAST(round(sqrt(CAST(lang_tokens AS DOUBLE) " +
          "/ CAST(total_tokens AS DOUBLE)) * 1000000) AS BIGINT)"))
    val sTot = scaled.agg(sum(col("s_micro")).as("s_total"))
    scaled.crossJoin(broadcast(sTot))
      .select(col("lang"), col("lang_tokens"),
        expr(s"$budget * s_micro div s_total").as("target_tokens"),
        expr(s"($budget * s_micro div s_total) * 1000000 div lang_tokens")
          .as("epochs_micro"))
      .withColumn("oversampled",
        (col("epochs_micro") > 1000000L).cast("int"))
  }

  /** Oracle for [[mixtureEpochs]] — identical sqrt-then-quantize
    * plan. */
  def mixtureEpochsSql(budget: Long = 50000L): String =
    s"""WITH bylang AS (
       |  SELECT lang,
       |         CAST(sum(len(string_split(text, ' '))) AS BIGINT)
       |           AS lang_tokens
       |  FROM documents GROUP BY 1
       |), tot AS (
       |  SELECT CAST(sum(lang_tokens) AS BIGINT) AS total_tokens
       |  FROM bylang
       |), scaled AS (
       |  SELECT lang, lang_tokens,
       |         CAST(round(sqrt(CAST(lang_tokens AS DOUBLE)
       |             / CAST(total_tokens AS DOUBLE)) * 1000000) AS BIGINT)
       |           AS s_micro
       |  FROM bylang, tot
       |), st AS (
       |  SELECT CAST(sum(s_micro) AS BIGINT) AS s_total FROM scaled
       |)
       |SELECT lang, lang_tokens,
       |       CAST($budget * s_micro // s_total AS BIGINT)
       |         AS target_tokens,
       |       CAST(($budget * s_micro // s_total) * 1000000 // lang_tokens
       |         AS BIGINT) AS epochs_micro,
       |       CAST(($budget * s_micro // s_total) * 1000000 // lang_tokens
       |         > 1000000 AS INTEGER) AS oversampled
       |FROM scaled, st""".stripMargin

  /** Duplication-by-quality profile — the crawl diagnostic that answers
    * "is my duplication concentrated in the junk?": documents bucketed
    * into quality bands (floor(quality·10), capped at band 9) crossed
    * with their [[Dedup.resolveDuplicates]] cluster membership. High
    * dup_ppm in low bands means dedup is mostly deleting junk (cheap
    * win); high dup_ppm in TOP bands means the crawl is re-fetching its
    * best sources (a crawl-scheduling bug worth fixing upstream).
    * Both inputs are session-cached shared stages (signature-contracted
    * CC labels + the quality scan); the profile itself is one keyed
    * join and a ≤10-row aggregate. The band boundary is computed from
    * the 6-rounded quality by identical double arithmetic in both
    * engines, so banding is drift-free. */
  def dupQualityProfile(docs: DataFrame): DataFrame =
    TextOps.qualityScore(docs).select(col("doc_id"), col("quality"))
      .join(Dedup.resolveDuplicates(docs), "doc_id")
      .withColumn("q_band",
        least(floor(col("quality") * 10).cast("long"), lit(9L)))
      .groupBy("q_band")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("cluster_size") > 1, 1L).otherwise(0L))
          .as("n_dup_docs"),
        sum(when(col("doc_id") =!= col("canonical_doc"), 1L).otherwise(0L))
          .as("n_dropped"))
      .withColumn("dup_ppm", expr("n_dup_docs * 1000000 div n_docs"))

  /** Oracle for [[dupQualityProfile]]. */
  val dupQualityProfileSql: String =
    s"""WITH RECURSIVE ${TextOps.qualityCte},
       |${Dedup.resolveCtesFrom("documents")}
       |SELECT least(CAST(floor(q.quality * 10) AS BIGINT), 9) AS q_band,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(CASE WHEN s.cluster_size > 1 THEN 1 ELSE 0 END)
       |         AS BIGINT) AS n_dup_docs,
       |       CAST(sum(CASE WHEN r.doc_id != r.canonical_doc THEN 1 ELSE 0 END)
       |         AS BIGINT) AS n_dropped,
       |       CAST(sum(CASE WHEN s.cluster_size > 1 THEN 1 ELSE 0 END)
       |         * 1000000 // count(*) AS BIGINT) AS dup_ppm
       |FROM q
       |JOIN resolved r USING (doc_id)
       |JOIN sizes s USING (canonical_doc)
       |GROUP BY 1""".stripMargin

  /** Per-source dedup token savings — what near-dup resolution is
    * WORTH, in budget terms: for each source, total token mass vs the
    * mass surviving canonical-only selection, with the exact-ppm
    * savings rate. The number that justifies (or kills) a dedup stage
    * in a 100-TB run, and per-source so the win is attributable to a
    * crawl. Rides the session-cached quality scan and resolution
    * labels; the profile is one keyed join + ≤|sources|-row
    * aggregate. */
  def dedupSavings(docs: DataFrame): DataFrame =
    TextOps.qualityScore(docs)
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"))
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .join(Dedup.resolveDuplicates(docs)
        .select(col("doc_id"), col("canonical_doc")), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(when(col("doc_id") === col("canonical_doc"), col("n_tokens"))
          .otherwise(0L)).as("kept_tokens"))
      .withColumn("savings_ppm",
        expr("(total_tokens - kept_tokens) * 1000000 div total_tokens"))

  /** Oracle for [[dedupSavings]]. */
  val dedupSavingsSql: String =
    s"""WITH RECURSIVE ${TextOps.qualityCte},
       |${Dedup.resolveCtesFrom("documents")}
       |SELECT d.source,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(q.n_tokens) AS BIGINT) AS total_tokens,
       |       CAST(sum(CASE WHEN r.doc_id = r.canonical_doc
       |                     THEN q.n_tokens ELSE 0 END) AS BIGINT)
       |         AS kept_tokens,
       |       CAST((sum(q.n_tokens) - sum(CASE WHEN r.doc_id = r.canonical_doc
       |                     THEN q.n_tokens ELSE 0 END)) * 1000000
       |            // sum(q.n_tokens) AS BIGINT) AS savings_ppm
       |FROM q
       |JOIN documents d USING (doc_id)
       |JOIN resolved r USING (doc_id)
       |GROUP BY 1""".stripMargin

  /** Two-phase anneal schedule — the midtraining curriculum plan the
    * modern pretraining recipe ends with: spend the bulk of the token
    * budget on the full source mixture, then an ANNEAL phase (here 1/5
    * of the budget, the exact-integer fraction) drawn only from the
    * top half of sources by mean document quality. Source ranking uses
    * the integer-micro mean quality (floor division — deterministic,
    * ties broken by source name); within each phase the budget is
    * allocated ∝ source token mass by exact floor division, so the
    * emitted plan is engine-portable to the digit.
    *
    * Scale shape: one partial-aggregated groupBy(source) over the
    * corpus (riding the same quality scan every other curation op
    * uses), then all planning math on the ≤|sources|-row table —
    * nothing after the first aggregate touches corpus-sized data. */
  def annealSchedule(docs: DataFrame, budget: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perSrc = TextOps.qualityScore(docs)
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        expr("CAST(round(quality * 1000000) AS BIGINT)").as("q_micro"))
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy("source")
      .agg(sum(col("n_tokens")).as("source_tokens"),
        sum(col("q_micro")).as("q_sum"), count(lit(1)).as("n_docs"))
      // exact floor division — a double quotient cast to long can land
      // on the wrong side of the boundary when the true quotient is
      // within one ulp of an integer
      .withColumn("mean_q_micro", expr("q_sum div n_docs"))
      .drop("q_sum", "n_docs")
    val ranked = perSrc
      .withColumn("rk", row_number().over(
        Window.orderBy(col("mean_q_micro").desc, col("source"))))
      .withColumn("n_src", count(lit(1)).over(
        Window.partitionBy()))
    val annealBudget = budget / 5
    val mainBudget = budget - annealBudget
    val main = ranked
      .withColumn("phase_total", sum(col("source_tokens")).over(
        Window.partitionBy()))
      .select(lit(1L).as("phase"), col("source"), col("source_tokens"),
        col("mean_q_micro"),
        expr(s"$mainBudget * source_tokens div phase_total")
          .as("target_tokens"))
    val anneal = ranked
      .filter(col("rk") <= (col("n_src") + 1) / 2)
      .withColumn("phase_total", sum(col("source_tokens")).over(
        Window.partitionBy()))
      .select(lit(2L).as("phase"), col("source"), col("source_tokens"),
        col("mean_q_micro"),
        expr(s"$annealBudget * source_tokens div phase_total")
          .as("target_tokens"))
    main.unionByName(anneal)
  }

  /** Oracle for [[annealSchedule]]. */
  def annealScheduleSql(budget: Long = 1000000L): String = {
    val annealBudget = budget / 5
    val mainBudget = budget - annealBudget
    s"""WITH RECURSIVE ${TextOps.qualityCte},
       |src AS (
       |  SELECT d.source,
       |         CAST(sum(q.n_tokens) AS BIGINT) AS source_tokens,
       |         CAST(sum(CAST(round(q.quality * 1000000) AS BIGINT))
       |           // count(*) AS BIGINT) AS mean_q_micro
       |  FROM documents d JOIN q USING (doc_id)
       |  GROUP BY 1
       |), ranked AS (
       |  SELECT *,
       |         row_number() OVER (ORDER BY mean_q_micro DESC, source) AS rk,
       |         count(*) OVER () AS n_src
       |  FROM src
       |), mt AS (
       |  SELECT CAST(sum(source_tokens) AS BIGINT) AS t FROM ranked
       |), at AS (
       |  SELECT CAST(sum(source_tokens) AS BIGINT) AS t FROM ranked
       |  WHERE rk <= (n_src + 1) // 2
       |)
       |SELECT 1 AS phase, source, source_tokens, mean_q_micro,
       |       CAST($mainBudget * source_tokens // mt.t AS BIGINT)
       |         AS target_tokens
       |FROM ranked, mt
       |UNION ALL
       |SELECT 2, source, source_tokens, mean_q_micro,
       |       CAST($annealBudget * source_tokens // at.t AS BIGINT)
       |FROM ranked, at WHERE rk <= (n_src + 1) // 2""".stripMargin
  }

  /** Oracle for [[filterFunnel]]. */
  val filterFunnelSql: String =
    s"""WITH RECURSIVE ${TextOps.qualityCte},
       |corpus AS (
       |  SELECT d.* FROM documents d JOIN q USING (doc_id)
       |  WHERE q.quality >= $minQuality
       |),
       |${Dedup.resolveCtesFrom("corpus")}
       |SELECT 0 AS stage_idx, 'raw' AS stage, count(*) AS n_docs
       |FROM documents
       |UNION ALL
       |SELECT 1, 'quality', count(*) FROM corpus
       |UNION ALL
       |SELECT 2, 'exact_dedup', count(DISTINCT md5(text)) FROM corpus
       |UNION ALL
       |SELECT 3, 'near_dedup', count(*) FROM resolved
       |WHERE doc_id = canonical_doc""".stripMargin

  /** Sequential dedup-cascade attribution — which tier of the
    * production dedup stack catches how much of the corpus: every doc
    * is classified by the STRICTEST relation that links it to a
    * lower-id keeper — byte-exact (`md5(text)`), shingle-exact (all 16
    * MinHash slots equal: whitespace/punctuation variants byte-md5
    * misses — an equivalence relation, so a window-min suffices, no
    * CC), then near-dup (the ≥0.5 banded-LSH connected components),
    * else survivor. The tiers are NESTED (exact text ⇒ identical
    * shingles ⇒ est 1.0 ≥ 0.5-cluster), so this single-pass
    * classification equals running the cascade sequentially: a removed
    * doc's signature twin survives into the next tier in its place,
    * the same contraction argument [[Dedup.resolveBySignature]] is
    * built on. Output is the 4-row decision table (docs + exact token
    * mass + ppm per tier) that prices each tier's marginal savings —
    * the number that decides whether the expensive tier runs at
    * 100 TB. Reuses the session-cached signature and resolution
    * stages; nothing new touches pair space. */
  def dedupCascade(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fpW = Window.partitionBy("fp")
    val base = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        md5(col("text")).as("fp"))
      .withColumn("minfp", min(col("doc_id")).over(fpW))
      .select("doc_id", "n_tokens", "minfp")
    val slots = (0 until 16).map(j => col(s"m$j"))
    val sigW = Window.partitionBy(slots: _*)
    val sigRep = Dedup.minhashSignatures(docs)
      .withColumn("sigrep", min(col("doc_id")).over(sigW))
      .select("doc_id", "sigrep")
    val res = Dedup.resolveDuplicates(docs)
      .select(col("doc_id"), col("canonical_doc"))
    val total = docs
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("total_tok"))
    base.join(sigRep, "doc_id").join(res, "doc_id")
      .withColumn("tier_idx", expr(
        """CASE WHEN doc_id > minfp THEN 0
          |     WHEN doc_id > sigrep THEN 1
          |     WHEN doc_id != canonical_doc THEN 2
          |     ELSE 3 END""".stripMargin))
      .withColumn("tier", expr(
        """CASE tier_idx WHEN 0 THEN 'exact' WHEN 1 THEN 'shingle_exact'
          |     WHEN 2 THEN 'near_dup' ELSE 'survivor' END""".stripMargin))
      .groupBy("tier_idx", "tier")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tok_sum"))
      .crossJoin(broadcast(total))
      .withColumn("tok_ppm", expr("(tok_sum * 1000000) div total_tok"))
      .select(col("tier_idx"), col("tier"), col("n_docs"), col("tok_sum"),
        col("tok_ppm"))
  }

  /** Oracle for [[dedupCascade]]: the [[Dedup.resolveCtesFrom]] chain
    * (which already defines `sig` and `resolved`) plus the two
    * window-min tiers. */
  def dedupCascadeSql: String = {
    val sigCols = (0 until 16).map(j => s"m$j").mkString(", ")
    s"""WITH ${Dedup.resolveCtesFrom("documents")},
       |fpw AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |         min(doc_id) OVER (PARTITION BY md5(text)) AS minfp
       |  FROM documents
       |), sgw AS (
       |  SELECT doc_id,
       |         min(doc_id) OVER (PARTITION BY $sigCols) AS sigrep
       |  FROM sig
       |), cls AS (
       |  SELECT f.doc_id, f.n_tokens,
       |         CASE WHEN f.doc_id > f.minfp THEN 0
       |              WHEN f.doc_id > g.sigrep THEN 1
       |              WHEN f.doc_id != r.canonical_doc THEN 2
       |              ELSE 3 END AS tier_idx
       |  FROM fpw f JOIN sgw g USING (doc_id)
       |       JOIN resolved r USING (doc_id)
       |)
       |SELECT tier_idx,
       |       CASE tier_idx WHEN 0 THEN 'exact' WHEN 1 THEN 'shingle_exact'
       |            WHEN 2 THEN 'near_dup' ELSE 'survivor' END AS tier,
       |       count(*) AS n_docs,
       |       CAST(sum(n_tokens) AS BIGINT) AS tok_sum,
       |       (CAST(sum(n_tokens) AS BIGINT) * 1000000)
       |         // (SELECT CAST(sum(CAST(len(string_split(text, ' '))
       |                AS BIGINT)) AS BIGINT) FROM documents) AS tok_ppm
       |FROM cls GROUP BY 1""".stripMargin
  }

  /** Quality × length corpus map — the 2-D census behind every
    * curation dashboard heatmap: docs and token mass per (quality
    * decile, length band) cell, the table that shows WHERE the corpus
    * lives before any threshold is chosen (is the low-quality mass
    * short spam or long boilerplate? — different filters). Quality
    * decile is `floor(q·10)` clamped to 9 (the
    * [[dupQualityProfile]] banding, IEEE-identical cross-engine);
    * length bands are fixed power-of-two token thresholds as a CASE
    * chain — pure integer compares, no log2. One aggregate over the
    * shared quality scan; ≤ 80 cells at any corpus size. */
  def corpusMap(docs: DataFrame): DataFrame =
    TextOps.qualityScore(docs)
      .select(col("doc_id"), col("n_tokens").cast("long").as("x"),
        col("quality"))
      .withColumn("qband", expr("least(CAST(floor(quality * 10) AS BIGINT), 9)"))
      .withColumn("lband", expr(
        """CASE WHEN x < 16 THEN 0 WHEN x < 32 THEN 1 WHEN x < 64 THEN 2
          |     WHEN x < 128 THEN 3 WHEN x < 256 THEN 4 WHEN x < 512 THEN 5
          |     WHEN x < 1024 THEN 6 ELSE 7 END""".stripMargin))
      .groupBy("qband", "lband")
      .agg(count(lit(1)).as("n_docs"), sum(col("x")).as("tok_sum"))

  /** Oracle for [[corpusMap]] — the shared quality CTE, identical
    * banding. */
  val corpusMapSql: String =
    s"""WITH ${TextOps.qualityCte}
       |SELECT least(CAST(floor(quality * 10) AS BIGINT), 9) AS qband,
       |       CASE WHEN n_tokens < 16 THEN 0 WHEN n_tokens < 32 THEN 1
       |            WHEN n_tokens < 64 THEN 2 WHEN n_tokens < 128 THEN 3
       |            WHEN n_tokens < 256 THEN 4 WHEN n_tokens < 512 THEN 5
       |            WHEN n_tokens < 1024 THEN 6 ELSE 7 END AS lband,
       |       count(*) AS n_docs,
       |       CAST(sum(n_tokens) AS BIGINT) AS tok_sum
       |FROM q GROUP BY 1, 2""".stripMargin

  /** Balanced training-shard plan — the write-side layout step after
    * curation: assign every document to one of `nShards` output shards
    * so shard TOKEN mass (what a data loader actually streams) is
    * near-equal, not just doc counts. Longest-processing-time-style:
    * docs sort by (n_tokens desc, doc_id) and deal round-robin by
    * rank, which bounds the shard-sum spread by one max-doc and is a
    * pure function of the corpus (a greedy least-loaded heap would be
    * sequential and engine-divergent). The global rank is computed
    * with the [[tokenBudgetSelect]] two-phase range-partition trick —
    * per-partition row counts prefix-summed on the driver-side tiny
    * table, so no single-reducer global window at 100 TB. Output is
    * the nShards-row plan: docs, token mass, and each shard's exact
    * ppm share of the corpus. */
  def shardPlan(docs: DataFrame, nShards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranged = docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .repartitionByRange(col("n_tokens").desc, col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val wOff = Window.orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy("pid").agg(count(lit(1)).as("pn"))
      .withColumn("offset", coalesce(sum(col("pn")).over(wOff), lit(0L)))
      .select("pid", "offset")
    val wIn = Window.partitionBy("pid")
      .orderBy(col("n_tokens").desc, col("doc_id"))
    val total = docs
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("total_tok"))
    ranged.join(broadcast(offsets), "pid")
      .withColumn("rn", col("offset") + row_number().over(wIn))
      .withColumn("shard", expr(s"(rn - 1) % $nShards"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tok_sum"))
      .crossJoin(broadcast(total))
      .withColumn("share_ppm", expr("(tok_sum * 1000000) div total_tok"))
      .select(col("shard"), col("n_docs"), col("tok_sum"), col("share_ppm"))
  }

  /** Oracle for [[shardPlan]]: the straight global-window form —
    * equal to the two-phase plan because the range-partition key IS
    * the sort key. */
  def shardPlanSql(nShards: Int = 8): String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), r AS (
       |  SELECT n_tokens,
       |         CAST(row_number() OVER (ORDER BY n_tokens DESC, doc_id)
       |           AS BIGINT) AS rn
       |  FROM t
       |)
       |SELECT (rn - 1) % $nShards AS shard,
       |       count(*) AS n_docs,
       |       CAST(sum(n_tokens) AS BIGINT) AS tok_sum,
       |       (CAST(sum(n_tokens) AS BIGINT) * 1000000)
       |         // (SELECT CAST(sum(n_tokens) AS BIGINT) FROM t) AS share_ppm
       |FROM r GROUP BY 1""".stripMargin

  /** P (extension) — square-root temperature sampling weights per
    * source: the standard down-weighting of dominant corpora when a
    * pretraining mix resamples sources (`w_i ∝ n_i^α`; α = ½ is the
    * one temperature whose power function is EXACT cross-engine —
    * `sqrt` is correctly rounded, `pow` is not, so ½ is chosen over
    * the fashionable 0.7 deliberately). Each source's √n
    * micro-quantizes through one floor (bit-equal inputs → bit-equal
    * integer), shares derive by integer division, and the ppm deficit
    * from flooring is repaid by LARGEST-REMAINDER seats with a
    * (remainder desc, source asc) tie-break — so the emitted weights
    * sum to EXACTLY 10⁶, the property a downstream sampler actually
    * relies on. One groupBy to |sources| rows; everything after is a
    * broadcast-sized window. */
  /** P (extension, r16) — deterministic source-BALANCING sampler.
    * Family relative: [[TextOps.stratifiedSample]] samples at FIXED
    * configured per-stratum rates and emits the surviving rows; this
    * op DERIVES the rates from the data (equalize every source to the
    * smallest) and emits the per-source audit row instead: downsample
    * every source to ~the smallest source's size with a seeded,
    * data-independent membership rule, and emit the per-source QC row
    * (docs, rate, achieved sample count, and a sampled-id digest so
    * two runs — or two ENGINES — can prove they picked the SAME
    * documents, not just the same number). Membership is a Lehmer
    * hash, `((doc_id · 48271) mod 2³¹−1) mod 10⁶ < rate_ppm`, chosen
    * over xxhash64 because BOTH engines can evaluate it exactly —
    * sampling that an oracle cannot replay is sampling that cannot be
    * audited. The multiply is guarded loud (Spark's non-ANSI int64
    * wraps silently where DuckDB raises; the kyle lesson inverted).
    * rate_ppm = target·10⁶ div n_docs is exact integer floor division.
    * Plan: one |sources| aggregate (broadcast both ways) + one
    * map-side hash filter + one |sources| aggregate — the corpus is
    * read once, nothing shuffles at row grain. 100 TB: the membership
    * rule is a pure function of doc_id, so re-sampling after corpus
    * growth keeps every previously-sampled doc whose source rate
    * didn't drop — stable samples under append, the property
    * reservoir sampling loses. */
  def balancedSample(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(min(col("n_docs")).as("target"))))
      .withColumn("rate_ppm", expr("target * 1000000 div n_docs"))
      .select(col("source").as("src2"), col("n_docs"), col("rate_ppm"))
    docs.select(col("doc_id"), col("source"))
      // loud at the boundary where DuckDB raises: 48271·doc_id must
      // stay in int64 or Spark would silently wrap while the oracle
      // errors — assert first, so both engines fail at the same point
      // bounded BOTH ways: a large-magnitude NEGATIVE doc_id would
      // also wrap doc_id·48271 past int64 (Spark silent, DuckDB loud).
      // Small negatives stay unguarded on purpose — both engines use
      // dividend-signed %, so they agree exactly below the boundary.
      .filter(expr(
        "assert_true(doc_id >= -(9223372036854775807 div 48271) AND " +
          "doc_id <= 9223372036854775807 div 48271, " +
          "'balanced_sample: |doc_id| too large for the exact Lehmer " +
          "hash — widen to DECIMAL') IS NULL"))
      .withColumn("h", expr("((doc_id * 48271) % 2147483647) % 1000000"))
      .join(broadcast(rates), col("source") === col("src2"))
      .groupBy("source")
      .agg(first(col("n_docs")).as("n_docs"),
        first(col("rate_ppm")).as("rate_ppm"),
        sum(expr("CASE WHEN h < rate_ppm THEN 1L ELSE 0L END"))
          .as("n_sampled"),
        sum(expr("CASE WHEN h < rate_ppm THEN doc_id ELSE 0L END"))
          .as("sampled_id_sum"))
  }

  /** Oracle for [[balancedSample]]. */
  val balancedSampleSql: String =
    """WITH n AS (
      |  SELECT source, count(*) AS n_docs FROM documents GROUP BY 1
      |), r AS (
      |  SELECT source, n_docs,
      |         (SELECT min(n_docs) FROM n) * 1000000 // n_docs AS rate_ppm
      |  FROM n
      |), h AS (
      |  SELECT d.source, d.doc_id, r.n_docs, r.rate_ppm,
      |         ((d.doc_id * 48271) % 2147483647) % 1000000 AS h
      |  FROM documents d JOIN r USING (source)
      |)
      |SELECT source, CAST(min(n_docs) AS BIGINT) AS n_docs,
      |       CAST(min(rate_ppm) AS BIGINT) AS rate_ppm,
      |       CAST(sum(CASE WHEN h < rate_ppm THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_sampled,
      |       CAST(sum(CASE WHEN h < rate_ppm THEN doc_id ELSE 0 END)
      |         AS BIGINT) AS sampled_id_sum
      |FROM h GROUP BY 1""".stripMargin

  def sqrtTemper(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .withColumn("r6", expr(
        "CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000.0D + 0.5D) " +
          "AS BIGINT)"))
    val tot = base.agg(sum(col("r6")).as("rt"),
      count(lit(1)).as("k"))
    val seats = Window.orderBy(expr("(r6 * 1000000) % rt").desc,
      col("source").asc)
    base.crossJoin(broadcast(tot))
      .withColumn("floor_ppm", expr("(r6 * 1000000) div rt"))
      .withColumn("rk", row_number().over(seats).cast("long"))
      .crossJoin(broadcast(base.crossJoin(tot)
        .agg(expr("1000000 - CAST(sum((r6 * 1000000) div rt) AS BIGINT)")
          .as("deficit"))))
      .withColumn("weight_ppm", expr(
        "floor_ppm + CASE WHEN rk <= deficit THEN 1 ELSE 0 END"))
      .select(col("source"), col("n_docs"), col("weight_ppm"))
  }

  /** Oracle for [[sqrtTemper]] — identical quantization, floor
    * shares, and largest-remainder seat assignment. */
  val sqrtTemperSql: String =
    """WITH b AS (
      |  SELECT source, count(*) AS n_docs,
      |         CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1000000.0
      |           + 0.5) AS BIGINT) AS r6
      |  FROM documents GROUP BY 1
      |), rt AS (
      |  SELECT CAST(sum(r6) AS BIGINT) AS rt FROM b
      |), t AS (
      |  SELECT rt.rt,
      |         1000000 - CAST(sum((b.r6 * 1000000) // rt.rt) AS BIGINT)
      |           AS deficit
      |  FROM b, rt GROUP BY rt.rt
      |)
      |SELECT source, n_docs,
      |       (r6 * 1000000) // rt
      |         + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS weight_ppm
      |FROM (
      |  SELECT b.source, b.n_docs, b.r6, t.rt, t.deficit,
      |         CAST(row_number() OVER (
      |           ORDER BY (b.r6 * 1000000) % t.rt DESC, b.source ASC)
      |           AS BIGINT) AS rk
      |  FROM b, t)""".stripMargin

  /** P (extension, r17) — K-ANONYMITY generalize-and-suppress release
    * (a NEW privacy-aggregation class: [[graft.sinks.Upsert.purge]] /
    * k23 erases a NAMED entity on request; this op protects EVERY
    * entity in a published aggregate — the Sweeney k-anonymity model
    * that GDPR-adjacent data releases gate on, and the standard
    * pre-release step for usage datasets accompanying a training
    * corpus). Users are generalized to a quasi-identifier pair —
    * dominant event type (argmax count, ties broken lexicographically)
    * × activity decile (ntile(10) over the deterministic total order
    * (n_ev, user_id)) — and every equivalence class smaller than k=5
    * is SUPPRESSED: its row still reports the class and its size (the
    * auditor's view), but the payload aggregate is withheld (NULL),
    * so no published statistic describes fewer than k people.
    *
    * Determinism: counts, argmax-with-tie-break, and ntile over a
    * total order are all exact-integer and engine-identical; the
    * published payload is an integer sum. No floats anywhere.
    *
    * 100-TB posture: two map-side-combined aggregations to user grain
    * (total + per-type counts), a per-user argmax window that rides
    * the user partitioning, ONE global ntile sort on the USER-grain
    * table (the documented q26-class cost: user grain is orders of
    * magnitude below event grain; Spark executes it as a
    * range-partitioned sort feeding a single-partition window — at
    * true 1e9-user scale the decile boundary would come from
    * approx-percentile instead, traded here for exact cross-engine
    * equality), and a final class-grain aggregate bounded by
    * 10 × |event types| rows at any corpus size. */
  def kAnonymize(events: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = events.groupBy("user_id").agg(count(lit(1)).as("n_ev"))
    val perType = events.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("c"))
    val wDom = Window.partitionBy("user_id")
      .orderBy(col("c").desc, col("event_type"))
    val dom = perType
      .withColumn("rn", row_number().over(wDom))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("dominant_type"))
    val wDecile = Window.orderBy(col("n_ev"), col("user_id"))
    u.join(dom, "user_id")
      .withColumn("decile", ntile(10).over(wDecile))
      .groupBy("dominant_type", "decile")
      .agg(count(lit(1)).as("n_users"), sum("n_ev").as("se"))
      .withColumn("published", col("n_users") >= k)
      .withColumn("sum_events",
        when(col("published"), col("se")).otherwise(lit(null)))
      .drop("se")
  }

  /** Oracle for [[kAnonymize]] (k = 5). */
  val kAnonymizeSql: String =
    """WITH u AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev
      |  FROM events GROUP BY 1),
      |t AS (
      |  SELECT user_id, event_type, count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |dom AS (
      |  SELECT user_id, event_type AS dominant_type FROM (
      |    SELECT user_id, event_type,
      |           row_number() OVER (PARTITION BY user_id
      |             ORDER BY c DESC, event_type) AS rn
      |    FROM t) WHERE rn = 1),
      |d AS (
      |  SELECT u.user_id, n_ev, dominant_type,
      |         ntile(10) OVER (ORDER BY n_ev, u.user_id) AS decile
      |  FROM u JOIN dom USING (user_id))
      |SELECT dominant_type, decile, CAST(count(*) AS BIGINT) AS n_users,
      |       count(*) >= 5 AS published,
      |       CASE WHEN count(*) >= 5
      |            THEN CAST(sum(n_ev) AS BIGINT) END AS sum_events
      |FROM d GROUP BY 1, 2""".stripMargin
}
