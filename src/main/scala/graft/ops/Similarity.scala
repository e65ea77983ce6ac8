package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over the embeddings table
  * (SURVEY.md §7.5): brute-force cosine top-k as the exact baseline, and
  * a random-hyperplane LSH-bucketed variant as the scale path.
  *
  * The dot product is a native codegen'd Catalyst expression
  * ([[graft.functions.DotProduct]]), not a UDF — the O(n·q·d) inner loop
  * stays inside whole-stage codegen. The query side is broadcast, so the
  * candidate scan is shuffle-free until the final per-query top-k.
  */
object Similarity {

  private def withVec(df: DataFrame): DataFrame =
    df.withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("norm", sqrt(expr("dot_product(v, v)")))

  /** Brute-force cosine top-k: every query vector against the full
    * candidate set. Exact; the oracle baseline for the LSH variant. */
  def cosineTopK(spark: SparkSession, dir: String, nQueries: Int = 10,
      k: Int = 5): DataFrame = {
    VectorOps.register(spark)
    val emb = withVec(graft.Tables.load(spark, dir, "embeddings"))
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qn"))
    val c = emb.select(col("vec_id"), col("v").as("cv"), col("norm").as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", expr("dot_product(qv, cv)") / (col("qn") * col("cn")))
    val byQ = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(byQ))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("vec_id"), (col("cos")).as("cos_sim"),
        col("rnk"))
  }

  /** Hard-negative mining — the contrastive-training data op: for each
    * query vector, the `k` nearest candidates by cosine whose LABEL
    * differs from the query's (close in embedding space, different
    * class — exactly the negatives a contrastive or reranker loss
    * wants; easy negatives are free, hard ones must be MINED). Same
    * broadcast-query one-pass candidate scan as [[cosineTopK]] — the
    * label inequality is a codegen'd filter before the score, so
    * mining costs no more than plain top-k. At 100 TB the exact scan
    * swaps for the ANN tier ([[annIvf]]/[[annLsh]]) with the label
    * filter applied post-probe; this exact form is the oracle
    * baseline, the [[cosineTopK]] discipline. */
  def hardNegatives(spark: SparkSession, dir: String, nQueries: Int = 10,
      k: Int = 3): DataFrame = {
    VectorOps.register(spark)
    val emb = withVec(graft.Tables.load(spark, dir, "embeddings"))
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("v").as("qv"), col("norm").as("qn"))
    val c = emb.select(col("vec_id"), col("label"), col("v").as("cv"),
      col("norm").as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("label") =!= col("q_label"))
      .withColumn("cos", expr("dot_product(qv, cv)") / (col("qn") * col("cn")))
    val byQ = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(byQ))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("q_label"), col("vec_id"),
        col("label").as("neg_label"), (col("cos")).as("cos_sim"),
        col("rnk"))
  }

  /** Oracle for [[hardNegatives]]. */
  def hardNegativesSql(nQueries: Int = 10, k: Int = 3): String =
    s"""WITH n AS (
       |  SELECT vec_id, label, embedding::DOUBLE[] AS v,
       |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
       |           AS nrm
       |  FROM embeddings
       |), q AS (
       |  SELECT vec_id AS q_id, label AS q_label, v AS qv, nrm AS qn
       |  FROM n WHERE vec_id < $nQueries
       |), s AS (
       |  SELECT q_id, q_label, vec_id, label AS neg_label,
       |         list_dot_product(qv, v) / (qn * nrm) AS cos
       |  FROM n, q WHERE label != q_label
       |)
       |SELECT q_id, q_label, vec_id, neg_label,
       |       (cos) AS cos_sim, rnk FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |            ORDER BY cos DESC, vec_id) AS rnk
       |  FROM s
       |) WHERE rnk <= $k""".stripMargin

  /** Exact maximum-inner-product top-k (MIPS) — the recommendation /
    * retrieval serving read where magnitude matters and cosine's
    * normalization is wrong (a user-item score IS the raw dot
    * product). Same broadcast-query scan shape as [[cosineTopK]];
    * candidate magnitudes rank, so no norm division anywhere. For the
    * approximate path at 100 TB, MIPS reduces to cosine ANN by the
    * standard norm augmentation (append `sqrt(M²−‖x‖²)` to candidates
    * and 0 to queries, M = max norm) and then rides [[annLsh]] /
    * [[annIvf]] unchanged — the reduction is a projection, so the
    * exact form here stays the oracle baseline. */
  def mipsTopK(spark: SparkSession, dir: String, nQueries: Int = 10,
      k: Int = 5): DataFrame = {
    VectorOps.register(spark)
    val emb = withVec(graft.Tables.load(spark, dir, "embeddings"))
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val scored = emb.select(col("vec_id"), col("v").as("cv"))
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("ip", expr("dot_product(qv, cv)"))
    val byQ = Window.partitionBy("q_id").orderBy(col("ip").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(byQ))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("vec_id"),
        (col("ip")).as("inner_product"), col("rnk"))
  }

  /** Hybrid retrieval with reciprocal-rank fusion — the modern RAG /
    * search stack's default: a lexical ranking (distinct-term overlap
    * via an inverted-index join — integer scores, so exactly
    * deterministic) and a vector ranking (cosine over the aligned
    * embedding) fused per query as `Σ 1/(60+rank)` over the lists the
    * doc appears in. Ranks are integers and each doc has at most TWO
    * terms added in a FIXED order (lex then vec), so the fused score
    * never hits float reassociation — the [[graft.ops.TradeOps
    * .chisqHourly]] lesson applied by construction rather than by
    * sorted fold. Both rankings keep only their top `kList` before the
    * fusion join (list truncation is part of RRF's definition, and the
    * per-query state stays O(kList) at any corpus size). */
  def hybridRrf(spark: SparkSession, dir: String, nQueries: Int = 5,
      kList: Int = 20, k: Int = 10, rrfK: Int = 60): DataFrame = {
    VectorOps.register(spark)
    val docs = graft.Tables.load(spark, dir, "documents")
    val words = docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("word"))
    val qWords = words.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("q_id"), col("word"))
    val overlap = words.join(qWords, "word")
      .filter(col("doc_id") =!= col("q_id"))
      .groupBy("q_id", "doc_id").agg(count(lit(1)).as("ov"))
    val byOv = Window.partitionBy("q_id")
      .orderBy(col("ov").desc, col("doc_id"))
    val lex = overlap.withColumn("rl", row_number().over(byOv))
      .filter(col("rl") <= kList).select("q_id", "doc_id", "rl")
    val emb = withVec(graft.Tables.load(spark, dir, "embeddings"))
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("norm").as("qn"))
    val byCos = Window.partitionBy("q_id")
      .orderBy(col("cos").desc, col("doc_id"))
    val vec = emb.select(col("vec_id").as("doc_id"), col("v").as("cv"),
        col("norm").as("cn"))
      .crossJoin(broadcast(q))
      .filter(col("doc_id") =!= col("q_id"))
      .withColumn("cos", expr("dot_product(qv, cv)") / (col("qn") * col("cn")))
      .withColumn("rv", row_number().over(byCos))
      .filter(col("rv") <= kList).select("q_id", "doc_id", "rv")
    val fused = lex.join(vec, Seq("q_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1d) / (col("rl") + lit(rrfK)).cast("double"), lit(0d))
          + coalesce(lit(1d) / (col("rv") + lit(rrfK)).cast("double"),
            lit(0d)))
    val byRrf = Window.partitionBy("q_id")
      .orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rnk", row_number().over(byRrf))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("doc_id"), (col("rrf")).as("rrf"),
        col("rnk"))
  }

  /** Oracle for [[hybridRrf]]. */
  def hybridRrfSql(nQueries: Int = 5, kList: Int = 20, k: Int = 10,
      rrfK: Int = 60): String =
    s"""WITH w AS (
       |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word
       |  FROM documents
       |), lexall AS (
       |  SELECT q.doc_id AS q_id, d.doc_id, count(*) AS ov
       |  FROM w q JOIN w d ON q.word = d.word AND d.doc_id != q.doc_id
       |  WHERE q.doc_id < $nQueries
       |  GROUP BY 1, 2
       |), lex AS (
       |  SELECT q_id, doc_id, rl FROM (
       |    SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY ov DESC, doc_id) AS rl
       |    FROM lexall) WHERE rl <= $kList
       |), e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |         sqrt(list_dot_product(embedding::DOUBLE[],
       |                               embedding::DOUBLE[])) AS nrm
       |  FROM embeddings
       |), qv AS (
       |  SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM e
       |  WHERE vec_id < $nQueries
       |), vecall AS (
       |  SELECT qv.q_id, e.vec_id AS doc_id,
       |         list_dot_product(qv.qv, e.v) / (qv.qn * e.nrm) AS cos
       |  FROM e, qv WHERE e.vec_id != qv.q_id
       |), vec AS (
       |  SELECT q_id, doc_id, rv FROM (
       |    SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY cos DESC, doc_id) AS rv
       |    FROM vecall) WHERE rv <= $kList
       |), fused AS (
       |  SELECT coalesce(lex.q_id, vec.q_id) AS q_id,
       |         coalesce(lex.doc_id, vec.doc_id) AS doc_id,
       |         coalesce(1.0::DOUBLE / CAST(lex.rl + $rrfK AS DOUBLE), 0.0::DOUBLE)
       |           + coalesce(1.0::DOUBLE / CAST(vec.rv + $rrfK AS DOUBLE), 0.0::DOUBLE)
       |           AS rrf
       |  FROM lex FULL OUTER JOIN vec
       |    ON lex.q_id = vec.q_id AND lex.doc_id = vec.doc_id
       |)
       |SELECT q_id, doc_id, (rrf) AS rrf, rnk FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY rrf DESC, doc_id) AS rnk
       |  FROM fused) WHERE rnk <= $k""".stripMargin

  /** Oracle for [[mipsTopK]]. */
  def mipsTopKSql(nQueries: Int = 10, k: Int = 5): String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |), q AS (
       |  SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $nQueries
       |), s AS (
       |  SELECT q_id, vec_id, list_dot_product(qv, v) AS ip
       |  FROM e, q WHERE vec_id != q_id
       |)
       |SELECT q_id, vec_id, (ip) AS inner_product, rnk FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY ip DESC, vec_id) AS rnk
       |  FROM s
       |) WHERE rnk <= $k""".stripMargin

  /** IVF (inverted-file) approximate nearest neighbor: partition the
    * vector space into `nCells` cells around centroid vectors, assign
    * every candidate to its nearest centroid, and at query time search
    * only the `nProbe` cells nearest the query — the standard
    * coarse-quantizer ANN layout.
    *
    * Centroids are k-means-trained ([[trainKmeans]] — `trainIters` Lloyd
    * passes seeded from the first `nCells` vectors), then collected to
    * the driver and inlined as literal arrays, so cell assignment is a
    * pure per-row projection over codegen'd
    * [[graft.functions.DotProduct]] calls — NO shuffle and no join to
    * build the index; this is exactly how a production IVF ships its
    * coarse quantizer (centroids ride along with the task binary,
    * candidates are streamed once). Empty cells drop during training, so
    * cell ids are POSITIONS in the surviving ascending-cell-id list (the
    * oracle re-indexes the same way). The probe-side join broadcasts
    * `nQueries × nProbe` rows, so the only shuffle in the whole plan is
    * the final per-query top-k over within-cell candidates — the
    * fraction the probe selected, not the corpus. */
  def annIvf(spark: SparkSession, dir: String, nQueries: Int = 10,
      k: Int = 5, nCells: Int = 16, nProbe: Int = 4,
      trainIters: Int = 2): DataFrame = {
    VectorOps.register(spark)
    val emb = withVec(graft.Tables.load(spark, dir, "embeddings"))
      .select(col("vec_id"), col("v"), col("norm"))
    val dim = emb.select(size(col("v"))).head().getInt(0)
    // centroid norms via the same left-to-right product sum as the
    // codegen'd dot_product / DuckDB's list_dot_product — bit-identical
    val cents = trainKmeansCached(spark, dir, emb, nCells, trainIters, dim)
      .map { case (_, c) =>
        (c, math.sqrt(c.foldLeft(0.0)((a, x) => a + x * x)))
      }
    val nLive = cents.length
    // sims[j] = cos(row, centroid_j); literal centroid arrays keep each
    // dot product a codegen'd tight loop over the row's vector
    val sims = array(cents.map { case (cv, cn) =>
      call_function("dot_product", col("v"), array(cv.map(lit): _*)) /
        (col("norm") * lit(cn))
    }: _*)
    // argmax with lowest-cell tie-break: array_position finds the FIRST
    // occurrence of the max. The assignment is materialized partitioned
    // by cell — this IS the inverted-file index build (one pass over the
    // corpus, stored grouped by cell; queries probe it repeatedly). It
    // also keeps the wide centroid-literal projection in its own codegen
    // stage: fused into the probe join it blows past the generated-
    // method size limit and the whole stage falls back to interpreted
    // evaluation (measured 8× slower).
    val n = spark.sessionState.conf.numShufflePartitions
    val assigned = emb.withColumn("sims", sims)
      .withColumn("cell",
        (array_position(col("sims"), array_max(col("sims"))) - 1).cast("int"))
      .drop("sims")
      .repartition(n, col("cell"))
      .localCheckpoint()
    // top-nProbe cells per query, ordered sim desc then cell asc (the
    // struct sort is (sim asc, -cell asc); reversed = sim desc, cell asc)
    val probeCells = expr(
      s"transform(slice(reverse(array_sort(zip_with(sims, " +
        s"sequence(0, ${nLive - 1}), (s, c) -> struct(s AS sim, -c AS negc)))), " +
        s"1, $nProbe), x -> CAST(-x.negc AS INT))")
    val probes = emb.filter(col("vec_id") < nQueries)
      .withColumn("sims", sims)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("norm").as("qn"), explode(probeCells).as("cell"))
    val byQ = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", expr("dot_product(qv, v)") / (col("qn") * col("norm")))
      .withColumn("rnk", row_number().over(byQ))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("vec_id"), (col("cos")).as("cos_sim"),
        col("rnk"))
  }

  /** Oracle for [[annIvf]]: identical cell assignment / probe / re-rank
    * semantics spelled out relationally (row_number argmax instead of
    * the inlined-literal projection), with the centroid table coming
    * from the same unrolled k-means chain as [[kmeansSql]] — surviving
    * cells re-indexed by position, exactly as the Scala side does. */
  /** The [[annIvfSql]] CTE chain up to a ranked `ivf` relation —
    * shared with [[ivfRecallSql]] so the recall oracle probes the
    * IDENTICAL index the serving oracle reads. */
  private def annIvfCtes(nQueries: Int, nCells: Int,
      nProbe: Int, trainIters: Int, dim: Int): String =
    s"""${kmeansChain(nCells, trainIters, dim)},
       |n AS (
       |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
       |), cent AS (
       |  SELECT CAST(row_number() OVER (ORDER BY cell) - 1 AS INT) AS cell,
       |         cv, sqrt(list_dot_product(cv, cv)) AS cn
       |  FROM cb$trainIters
       |), scored AS (
       |  SELECT n.vec_id, n.v, n.nrm, c.cell,
       |         row_number() OVER (PARTITION BY n.vec_id
       |           ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cn) DESC,
       |                    c.cell) AS rc
       |  FROM n, cent c
       |), assigned AS (
       |  SELECT vec_id, v, nrm, cell FROM scored WHERE rc = 1
       |), probes AS (
       |  SELECT vec_id AS q_id, cell FROM scored
       |  WHERE vec_id < $nQueries AND rc <= $nProbe
       |), q AS (
       |  SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n WHERE vec_id < $nQueries
       |), s AS (
       |  SELECT p.q_id, a.vec_id,
       |         list_dot_product(q.qv, a.v) / (q.qn * a.nrm) AS cos
       |  FROM probes p
       |  JOIN assigned a ON a.cell = p.cell
       |  JOIN q ON q.q_id = p.q_id
       |  WHERE a.vec_id != p.q_id
       |), ivf AS (
       |  SELECT q_id, vec_id, cos, row_number() OVER (PARTITION BY q_id
       |    ORDER BY cos DESC, vec_id) AS rnk
       |  FROM s
       |)""".stripMargin

  def annIvfSql(nQueries: Int = 10, k: Int = 5, nCells: Int = 16,
      nProbe: Int = 4, trainIters: Int = 2, dim: Int = 64): String =
    s"""WITH ${annIvfCtes(nQueries, nCells, nProbe, trainIters, dim)}
       |SELECT q_id, vec_id, (cos) AS cos_sim, rnk
       |FROM ivf WHERE rnk <= $k""".stripMargin

  /** Recall@k of the IVF index against exact brute-force cosine top-k —
    * the quality dial every IVF deployment tunes `nProbe` with,
    * completing the measurement family (LSH: [[graft.ops.Dedup.lshRecall]];
    * quantizer: [[kmeansPurity]]). Both sides exclude self-matches and
    * break ties by candidate id, and both engines compute the identical
    * IEEE cosine, so the hit count is deterministic cross-engine. The
    * exact side is the [[cosineTopK]] broadcast-query scan — at 100 TB
    * recall is measured over a SAMPLE of queries (nQueries), never the
    * corpus, which is exactly what this plan does. */
  def ivfRecall(spark: SparkSession, dir: String, nQueries: Int = 10,
      k: Int = 5, nCells: Int = 16, nProbe: Int = 4,
      trainIters: Int = 2): DataFrame = {
    val ivf = annIvf(spark, dir, nQueries, k, nCells, nProbe, trainIters)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    cosineTopK(spark, dir, nQueries, k)
      .select("q_id", "vec_id")
      .join(ivf, Seq("q_id", "vec_id"), "left")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .select(col("n_exact"), col("n_hits"),
        (col("n_hits").cast("double") / col("n_exact").cast("double"))
          .as("recall"))
  }

  /** Oracle for [[ivfRecall]]: the same IVF chain as [[annIvfSql]] plus
    * a brute-force top-k CTE, hit-joined. */
  def ivfRecallSql(nQueries: Int = 10, k: Int = 5, nCells: Int = 16,
      nProbe: Int = 4, trainIters: Int = 2, dim: Int = 64): String =
    s"""WITH ${annIvfCtes(nQueries, nCells, nProbe, trainIters, dim)},
       |ivfk AS (
       |  SELECT q_id, vec_id FROM ivf WHERE rnk <= $k
       |), brute AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.q_id, n2.vec_id,
       |           row_number() OVER (PARTITION BY q.q_id
       |             ORDER BY list_dot_product(q.qv, n2.v) / (q.qn * n2.nrm) DESC,
       |                      n2.vec_id) AS rnk
       |    FROM q, n n2 WHERE n2.vec_id != q.q_id
       |  ) WHERE rnk <= $k
       |)
       |SELECT CAST(count(*) AS BIGINT) AS n_exact,
       |       CAST(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |         AS BIGINT) AS n_hits,
       |       (CAST(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |           AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS recall
       |FROM brute b LEFT JOIN ivfk i
       |  ON b.q_id = i.q_id AND b.vec_id = i.vec_id""".stripMargin

  /** Recall-vs-k operating curve for the IVF index — the band-tuning
    * S-curve idea applied to ANN serving: one probe pass at k_max
    * feeds EVERY cutoff (recall@1, @5, @10, @20) as rank-threshold
    * bit tests, so the table an index review tunes k against costs one
    * index probe plus a broadcast of the 4-row cutoff list, not four
    * searches. Recall@k = |top_k(exact) ∩ top_k(ivf)| / (nQueries·k),
    * the same definition the single-point recall rows use. */
  def ivfRecallCurve(spark: SparkSession, dir: String, nQueries: Int = 10,
      ks: Seq[Int] = Seq(1, 5, 10, 20), nCells: Int = 16, nProbe: Int = 4,
      trainIters: Int = 2): DataFrame = {
    import spark.implicits._
    val kmax = ks.max
    val approx = annIvf(spark, dir, nQueries, kmax, nCells, nProbe,
        trainIters)
      .select(col("q_id"), col("vec_id"), col("rnk").as("ra"))
    val exact = cosineTopK(spark, dir, nQueries, kmax)
      .select(col("q_id"), col("vec_id"), col("rnk").as("re"))
    val kDf = ks.toDF("k")
    exact.join(approx, Seq("q_id", "vec_id"), "left")
      .join(broadcast(kDf), col("re") <= col("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_exact"),
        sum(when(col("ra").isNotNull && col("ra") <= col("k"), 1L)
          .otherwise(0L)).as("n_hits"))
      .select(col("k"), col("n_exact"), col("n_hits"),
        (col("n_hits").cast("double") / col("n_exact").cast("double"))
          .as("recall"))
  }

  /** Oracle for [[ivfRecallCurve]]: the shared [[annIvfCtes]] index,
    * both rankings kept to k_max, cutoffs stacked by VALUES. */
  def ivfRecallCurveSql(nQueries: Int = 10, ks: Seq[Int] = Seq(1, 5, 10, 20),
      nCells: Int = 16, nProbe: Int = 4, trainIters: Int = 2,
      dim: Int = 64): String = {
    val kmax = ks.max
    val values = ks.map(k => s"($k)").mkString(", ")
    s"""WITH ${annIvfCtes(nQueries, nCells, nProbe, trainIters, dim)},
       |ik AS (
       |  SELECT q_id, vec_id, rnk AS ra FROM ivf WHERE rnk <= $kmax
       |), bfc AS (
       |  SELECT q_id, vec_id, rnk AS re FROM (
       |    SELECT q.q_id, n2.vec_id,
       |           row_number() OVER (PARTITION BY q.q_id
       |             ORDER BY list_dot_product(q.qv, n2.v) / (q.qn * n2.nrm) DESC,
       |                      n2.vec_id) AS rnk
       |    FROM q, n n2 WHERE n2.vec_id != q.q_id
       |  ) WHERE rnk <= $kmax
       |), t AS (
       |  SELECT * FROM (VALUES $values) v(k)
       |)
       |SELECT t.k,
       |       CAST(count(*) AS BIGINT) AS n_exact,
       |       CAST(sum(CASE WHEN i.ra IS NOT NULL AND i.ra <= t.k
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       |       (CAST(sum(CASE WHEN i.ra IS NOT NULL AND i.ra <= t.k
       |                          THEN 1 ELSE 0 END) AS DOUBLE)
       |             / CAST(count(*) AS DOUBLE)) AS recall
       |FROM bfc b
       |JOIN t ON b.re <= t.k
       |LEFT JOIN ik i ON i.q_id = b.q_id AND i.vec_id = b.vec_id
       |GROUP BY 1""".stripMargin
  }

  /** Matryoshka (truncated-dimension) retrieval quality: recall@k of
    * cosine search over only the FIRST `subDim` embedding dimensions
    * against full-dimension search — the measurement behind
    * matryoshka-representation deployment (serve a prefix of the vector,
    * keep most of the quality, cut index memory subDim/dim-fold). Same
    * hit-join shape as [[ivfRecall]]; both sides share tie-break and
    * IEEE cosine, so the count is exact cross-engine. At 100 TB this is
    * the experiment run BEFORE building the index fleet — on a query
    * sample, exactly this plan. */
  def mrlRecall(spark: SparkSession, dir: String, nQueries: Int = 10,
      k: Int = 5, subDim: Int = 16): DataFrame = {
    VectorOps.register(spark)
    val emb = withVec(graft.Tables.load(spark, dir, "embeddings"))
    val sub = emb.select(col("vec_id"), expr(s"slice(v, 1, $subDim)").as("sv"))
      .withColumn("snorm", sqrt(expr("dot_product(sv, sv)")))
    def topk(cands: DataFrame, vc: String, nc: String): DataFrame = {
      val q = cands.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col(vc).as("qv"), col(nc).as("qn"))
      val byQ = Window.partitionBy("q_id")
        .orderBy(col("cos").desc, col("vec_id"))
      cands.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cos", expr(s"dot_product(qv, $vc)") / (col("qn") * col(nc)))
        .withColumn("rnk", row_number().over(byQ))
        .filter(col("rnk") <= k)
        .select("q_id", "vec_id")
    }
    val full = topk(emb.select(col("vec_id"), col("v"), col("norm")),
      "v", "norm")
    val trunc = topk(sub, "sv", "snorm").withColumn("hit", lit(1L))
    full.join(trunc, Seq("q_id", "vec_id"), "left")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .select(col("n_exact"), col("n_hits"),
        (col("n_hits").cast("double") / col("n_exact").cast("double"))
          .as("recall"),
        lit(subDim).as("sub_dim"))
  }

  /** Oracle for [[mrlRecall]] — DuckDB's inclusive list slice `v[1:d]`
    * is Spark's `slice(v, 1, d)`. */
  def mrlRecallSql(nQueries: Int = 10, k: Int = 5, subDim: Int = 16): String =
    s"""WITH n AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
       |  FROM embeddings
       |), s AS (
       |  SELECT vec_id, v[1:$subDim] AS sv,
       |         sqrt(list_dot_product(v[1:$subDim], v[1:$subDim])) AS snrm
       |  FROM n
       |), bf AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.vec_id AS q_id, n2.vec_id,
       |           row_number() OVER (PARTITION BY q.vec_id
       |             ORDER BY list_dot_product(q.v, n2.v) / (q.nrm * n2.nrm) DESC,
       |                      n2.vec_id) AS rnk
       |    FROM n q, n n2
       |    WHERE q.vec_id < $nQueries AND n2.vec_id != q.vec_id
       |  ) WHERE rnk <= $k
       |), bs AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.vec_id AS q_id, s2.vec_id,
       |           row_number() OVER (PARTITION BY q.vec_id
       |             ORDER BY list_dot_product(q.sv, s2.sv) / (q.snrm * s2.snrm) DESC,
       |                      s2.vec_id) AS rnk
       |    FROM s q, s s2
       |    WHERE q.vec_id < $nQueries AND s2.vec_id != q.vec_id
       |  ) WHERE rnk <= $k
       |)
       |SELECT CAST(count(*) AS BIGINT) AS n_exact,
       |       CAST(sum(CASE WHEN bs.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |         AS BIGINT) AS n_hits,
       |       (CAST(sum(CASE WHEN bs.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |           AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS recall,
       |       $subDim AS sub_dim
       |FROM bf LEFT JOIN bs ON bf.q_id = bs.q_id AND bf.vec_id = bs.vec_id""".stripMargin

  /** Per-vector int8 scalar quantization — the storage-compression pass
    * ANN systems run before indexing (4× smaller than float32):
    * `q_i = round((x_i - min) / ((max - min) / 255)) - 128`. Emitted as
    * scalar digests (sum/min/max over the quantized codes) so the
    * oracle comparison stays column-typed; the codes themselves would
    * ship as an `array<tinyint>` column in a real sink. Constant
    * vectors quantize to all-zero codes. */
  def quantizeInt8(spark: SparkSession, dir: String): DataFrame = {
    val emb = graft.Tables.load(spark, dir, "embeddings")
      .withColumn("v", col("embedding").cast("array<double>"))
    emb
      .withColumn("q", expr(
        """CASE WHEN array_max(v) = array_min(v)
          |  THEN transform(v, x -> 0)
          |  ELSE transform(v, x -> CAST(round((x - array_min(v)) /
          |    ((array_max(v) - array_min(v)) / 255.0D)) AS INT) - 128)
          |END""".stripMargin))
      .select(col("vec_id"),
        expr("CAST(aggregate(q, 0L, (a, x) -> a + x) AS BIGINT)").as("q_sum"),
        expr("array_min(q)").as("q_min"),
        expr("array_max(q)").as("q_max"),
        size(col("q")).as("dim"))
  }

  /** Recall@k of brute-force cosine search over INT8-RECONSTRUCTED
    * vectors against full-precision search — the measured-recall twin
    * [[quantizeInt8]] was missing (every approximate path ships one:
    * LSH, IVF, multi-probe, PQ, MRL — scalar quantization is equally
    * lossy and equally deployed). Each vector is dequantized through
    * the same per-vector affine code [[quantizeInt8]] emits
    * (`x̂ = round((x−min)/s)·s + min`, s = (max−min)/255), and the
    * top-k runs on x̂ cosines — so the number answers "what recall do
    * I keep if I serve int8". All arithmetic is IEEE mul/div/add and
    * half-up round, identical in both engines; ranking uses the raw
    * double with vec_id tiebreak (the [[rangeSearch]] discipline).
    * Scale shape: the query side broadcasts, the candidate scan is
    * shuffle-free, the top-k is per-partition heaps. */
  def int8Recall(spark: SparkSession, dir: String, nQueries: Int = 10,
      k: Int = 5): DataFrame = {
    VectorOps.register(spark)
    val emb = withVec(graft.Tables.load(spark, dir, "embeddings"))
    val rec = emb
      .withColumn("vh", expr(
        """CASE WHEN array_max(v) = array_min(v) THEN v
          |  ELSE transform(v, x ->
          |    round((x - array_min(v)) /
          |      ((array_max(v) - array_min(v)) / 255.0D), 0) *
          |      ((array_max(v) - array_min(v)) / 255.0D) + array_min(v))
          |END""".stripMargin))
      .withColumn("hn", sqrt(expr("dot_product(vh, vh)")))
    val q = rec.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("vh").as("qv"), col("hn").as("qn"))
    val scored = rec.select(col("vec_id"), col("vh").as("cv"), col("hn").as("cn"))
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", expr("dot_product(qv, cv)") / (col("qn") * col("cn")))
    val byQ = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    val int8k = scored.withColumn("rnk", row_number().over(byQ))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    cosineTopK(spark, dir, nQueries, k)
      .select("q_id", "vec_id")
      .join(int8k, Seq("q_id", "vec_id"), "left")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .select(col("n_exact"), col("n_hits"),
        (col("n_hits").cast("double") / col("n_exact").cast("double"))
          .as("recall"))
  }

  /** Oracle for [[int8Recall]]: the identical dequantization lambda,
    * brute-force top-k in both spaces, hit-joined. */
  def int8RecallSql(nQueries: Int = 10, k: Int = 5): String =
    s"""WITH n AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
       |           AS nrm
       |  FROM embeddings
       |), r AS (
       |  SELECT vec_id,
       |    CASE WHEN list_max(v) = list_min(v) THEN v
       |      ELSE list_transform(v, x ->
       |        round((x - list_min(v)) /
       |          ((list_max(v) - list_min(v)) / 255.0::DOUBLE)) *
       |          ((list_max(v) - list_min(v)) / 255.0::DOUBLE) + list_min(v))
       |    END AS vh
       |  FROM n
       |), rh AS (
       |  SELECT vec_id, vh, sqrt(list_dot_product(vh, vh)) AS hn FROM r
       |), i8 AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id,
       |           row_number() OVER (PARTITION BY q.vec_id
       |             ORDER BY list_dot_product(q.vh, c.vh) / (q.hn * c.hn) DESC,
       |                      c.vec_id) AS rnk
       |    FROM rh q, rh c
       |    WHERE q.vec_id < $nQueries AND c.vec_id != q.vec_id
       |  ) WHERE rnk <= $k
       |), bf AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id,
       |           row_number() OVER (PARTITION BY q.vec_id
       |             ORDER BY list_dot_product(q.v, c.v) / (q.nrm * c.nrm) DESC,
       |                      c.vec_id) AS rnk
       |    FROM n q, n c
       |    WHERE q.vec_id < $nQueries AND c.vec_id != q.vec_id
       |  ) WHERE rnk <= $k
       |)
       |SELECT CAST(count(*) AS BIGINT) AS n_exact,
       |       CAST(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |         AS BIGINT) AS n_hits,
       |       (CAST(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |           AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS recall
       |FROM bf LEFT JOIN i8 i
       |  ON bf.q_id = i.q_id AND bf.vec_id = i.vec_id""".stripMargin

  val quantizeInt8Sql: String =
    """WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |), qz AS (
      |  SELECT vec_id,
      |    CASE WHEN list_max(v) = list_min(v)
      |      THEN list_transform(v, x -> 0)
      |      ELSE list_transform(v, x -> CAST(round((x - list_min(v)) /
      |        ((list_max(v) - list_min(v)) / 255.0::DOUBLE)) AS INT) - 128)
      |    END AS q
      |  FROM e
      |)
      |SELECT vec_id,
      |  CAST(list_sum(q) AS BIGINT) AS q_sum,
      |  list_min(q) AS q_min,
      |  list_max(q) AS q_max,
      |  len(q) AS dim
      |FROM qz""".stripMargin

  /** Oracle for [[annLsh]]: the hyperplane bits are deterministic (the
    * [[graft.functions.VectorOps.hyperplaneSignSql]] mix, the exact
    * mirror of [[graft.functions.HyperplaneLshBits]]), so the whole
    * LSH pipeline — bucket assignment, bucket join, exact re-rank — is
    * reproducible in SQL. A sign flip would need a hyperplane sum
    * within one ulp of zero (never observed; the sum has 64 ±0.1-scale
    * terms). */
  /** The [[annLshSql]] CTE chain up to the scored candidate relation
    * `s(q_id, vec_id, cos)` — shared with [[lshAnnRecallSql]] so the
    * recall oracle probes the IDENTICAL buckets the serving oracle
    * reads (the [[ivfRecallSql]] pattern). */
  private def annLshCtes(nQueries: Int, nBits: Int, dim: Int): String = {
    val bits = (0 until nBits).map { j =>
      val sign = graft.functions.VectorOps.hyperplaneSignSql("(i - 1)", j)
      s"""CASE WHEN list_sum(list_transform(generate_series(1, $dim),
         |  i -> v[i] * $sign)) > 0.0::DOUBLE
         |  THEN ${1 << j} ELSE 0 END""".stripMargin
    }.mkString(" +\n      ")
    s"""n AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
       |  FROM embeddings
       |), b AS (
       |  SELECT vec_id, v, nrm,
       |      $bits AS bucket
       |  FROM n
       |), q AS (
       |  SELECT vec_id AS q_id, v AS qv, nrm AS qn, bucket FROM b
       |  WHERE vec_id < $nQueries
       |), s AS (
       |  SELECT q.q_id, b.vec_id,
       |         list_dot_product(q.qv, b.v) / (q.qn * b.nrm) AS cos
       |  FROM b JOIN q ON b.bucket = q.bucket
       |  WHERE b.vec_id != q.q_id
       |)""".stripMargin
  }

  def annLshSql(nQueries: Int = 10, k: Int = 3, nBits: Int = 8,
      dim: Int = 64): String =
    s"""WITH ${annLshCtes(nQueries, nBits, dim)}
       |SELECT q_id, vec_id, (cos) AS cos_sim, rnk FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY cos DESC, vec_id) AS rnk
       |  FROM s
       |) WHERE rnk <= $k""".stripMargin

  /** Recall@k of the hyperplane-LSH index against exact brute-force
    * cosine top-k — the quality dial `nBits` is tuned with, completing
    * the recall family ([[ivfRecall]]: IVF/nProbe; [[mrlRecall]]:
    * truncated dims; [[graft.ops.Dedup.lshRecall]]: MinHash bands).
    * Same hit-join shape as [[ivfRecall]]: both sides exclude
    * self-matches, tie-break by candidate id, and compute the identical
    * IEEE cosine, so the hit count is deterministic cross-engine. This
    * row exists because a DEGENERATE plane family is invisible to the
    * serving oracle (it mirrors the same planes, broken or not — the r9
    * lesson): collapsed buckets show up here instead as a
    * suspiciously-perfect recall from near-all-pairs scanning, while a
    * healthy family pays measurable recall for its bucket selectivity. */
  def lshAnnRecall(spark: SparkSession, dir: String, nQueries: Int = 10,
      k: Int = 3, nBits: Int = 8): DataFrame = {
    val lsh = annLsh(spark, dir, nQueries, k, nBits)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    cosineTopK(spark, dir, nQueries, k)
      .select("q_id", "vec_id")
      .join(lsh, Seq("q_id", "vec_id"), "left")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .select(col("n_exact"), col("n_hits"),
        (col("n_hits").cast("double") / col("n_exact").cast("double"))
          .as("recall"),
        lit(nBits).as("n_bits"))
  }

  /** Oracle for [[lshAnnRecall]]: the same LSH chain as [[annLshSql]]
    * plus a brute-force top-k CTE, hit-joined. */
  def lshAnnRecallSql(nQueries: Int = 10, k: Int = 3, nBits: Int = 8,
      dim: Int = 64): String =
    s"""WITH ${annLshCtes(nQueries, nBits, dim)},
       |lshk AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY cos DESC, vec_id) AS rnk
       |    FROM s
       |  ) WHERE rnk <= $k
       |), brute AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.q_id, n2.vec_id,
       |           row_number() OVER (PARTITION BY q.q_id
       |             ORDER BY list_dot_product(q.qv, n2.v) / (q.qn * n2.nrm) DESC,
       |                      n2.vec_id) AS rnk
       |    FROM q, n n2 WHERE n2.vec_id != q.q_id
       |  ) WHERE rnk <= $k
       |)
       |SELECT CAST(count(*) AS BIGINT) AS n_exact,
       |       CAST(sum(CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |         AS BIGINT) AS n_hits,
       |       (CAST(sum(CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |           AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS recall,
       |       $nBits AS n_bits
       |FROM brute b LEFT JOIN lshk l
       |  ON b.q_id = l.q_id AND b.vec_id = l.vec_id""".stripMargin

  /** Product quantization codes — the storage layout of an IVF-PQ ANN
    * index ([[annIvf]] is the coarse stage; PQ compresses the residual
    * representation): split each vector into `m` subvectors, quantize
    * every subvector to its nearest codebook entry (argmin L2), and
    * pack the `m` 4-bit codes into one integer. 64-dim float32 → 8
    * bytes per vector at m=8/k=16.
    *
    * Codebooks are the subvectors of k-means-trained centroids
    * ([[trainKmeans]], the same training [[annIvf]] uses — position-
    * indexed over surviving cells), collected once (tiny) and inlined as
    * literals — code assignment is a pure shuffle-free per-row
    * projection, exactly how a production PQ encoder ships its codebooks
    * with the task binary. argmin uses ||c||² − 2·⟨v_s, c⟩
    * (rank-equivalent to L2) with first-index tie-break, reproduced
    * verbatim by the oracle. The code-packing radix stays `k` regardless
    * of how many centroids survive (positions < survivors ≤ k). The
    * reconstruction-error digest rides along unrounded — every input
    * double is bit-identical cross-engine, and the fixed-association
    * 8-term sum stays that way. */
  def pqCodes(spark: SparkSession, dir: String, m: Int = 8,
      k: Int = 16, trainIters: Int = 2): DataFrame = {
    VectorOps.register(spark)
    val emb = graft.Tables.load(spark, dir, "embeddings")
      .withColumn("v", col("embedding").cast("array<double>"))
    val dim = emb.select(size(col("v"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim must split into $m subvectors")
    val sub = dim / m
    // codebook: m subvectors of each trained centroid (driver-side,
    // ≤k·dim doubles — tiny, the justified collect of a quantizer build)
    val cb: IndexedSeq[IndexedSeq[Double]] =
      trainKmeansCached(spark, dir, emb, k, trainIters, dim).map(_._2)
    def centLit(ci: Int, s: Int) =
      array(cb(ci).slice(s * sub, (s + 1) * sub).map(lit): _*)
    // per subspace s: scores[ci] = ⟨c,c⟩ − 2⟨v_s,c⟩ (both via the same
    // codegen'd dot_product the oracle mirrors with list_dot_product —
    // proven bit-compatible by the ANN oracles); argmin = first min
    def scoreCol(s: Int) = array(cb.indices.map { ci =>
      call_function("dot_product", centLit(ci, s), centLit(ci, s)) -
        lit(2.0) * call_function("dot_product",
          slice(col("v"), s * sub + 1, sub), centLit(ci, s))
    }: _*)
    val scored = (0 until m).foldLeft(emb) { (df, s) =>
      df.withColumn(s"sc$s", scoreCol(s))
    }
    val code = (0 until m).map { s =>
      (array_position(col(s"sc$s"), array_min(col(s"sc$s"))) - 1)
        .cast("long") * lit(BigInt(k).pow(s).toLong)
    }.reduce(_ + _)
    val err = (0 until m).map(s => array_min(col(s"sc$s"))).reduce(_ + _)
    scored.select(col("vec_id"), code.as("pq_code"), err.as("pq_score_sum"))
  }

  def pqCodesSql(m: Int = 8, k: Int = 16, dim: Int = 64,
      trainIters: Int = 2): String = {
    val sub = dim / m
    def sl(x: String) = s"$x[s.s * $sub + 1 : (s.s + 1) * $sub]"
    // engine-matching association: the error sum is spelled as the same
    // left-to-right chain of the m per-subspace minima
    val errSum = (0 until m)
      .map(s => s"max(CASE WHEN s = $s THEN score END)").mkString(" + ")
    // ci is INT32 (row_number position); the radix factors reach 16⁷, so
    // pack in BIGINT
    val codeSum = (0 until m)
      .map(s => s"CAST(max(CASE WHEN s = $s THEN ci END) AS BIGINT)" +
        s" * ${BigInt(k).pow(s).toLong}")
      .mkString(" + ")
    s"""WITH ${kmeansChain(k, trainIters, dim)},
       |cb AS (
       |  SELECT CAST(row_number() OVER (ORDER BY cell) - 1 AS INT) AS ci, cv
       |  FROM cb$trainIters
       |), scored AS (
       |  SELECT e.vec_id, s.s, cb.ci,
       |    list_dot_product(${sl("cb.cv")}, ${sl("cb.cv")}) -
       |    2.0::DOUBLE * list_dot_product(${sl("e.v")}, ${sl("cb.cv")}) AS score
       |  FROM e
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${m - 1})) AS s) s
       |  CROSS JOIN cb
       |), best AS (
       |  SELECT vec_id, s, ci, score,
       |         row_number() OVER (PARTITION BY vec_id, s
       |           ORDER BY score, ci) AS rc
       |  FROM scored
       |)
       |SELECT vec_id,
       |       CAST($codeSum AS BIGINT) AS pq_code,
       |       $errSum AS pq_score_sum
       |FROM best WHERE rc = 1
       |GROUP BY vec_id""".stripMargin
  }

  /** V (extension) — PQ code-space occupancy decade histogram: the
    * [[graft.ops.Dedup.bucketSkew]] self-surveillance applied to the
    * PQ tier. A healthy codebook spreads vectors across many codes; a
    * collapsed one funnels the corpus into few codes, and ADC scans
    * ([[pqAdc]]) then rank ties by code — recall dies silently. The
    * decade histogram of per-code occupancy (digit-count decade — no
    * floating log) is the one-glance health read: mass in high decades
    * = collapse. Rides [[pqCodes]]'s shuffle-free projection (same
    * cached k-means); one groupBy on the packed code + a ≤ ~10-row
    * re-aggregation. Integer throughout. */
  def pqOccupancy(spark: SparkSession, dir: String, m: Int = 8,
      k: Int = 16, trainIters: Int = 2): DataFrame =
    pqCodes(spark, dir, m, k, trainIters)
      .groupBy("pq_code").agg(count(lit(1)).as("occ"))
      .groupBy(expr("CAST(length(CAST(occ AS STRING)) - 1 AS BIGINT)")
        .as("occ_decade"))
      .agg(count(lit(1)).as("n_codes"), sum(col("occ")).as("n_vecs"),
        max(col("occ")).as("max_occ"))

  /** Oracle for [[pqOccupancy]] — [[pqCodesSql]] as a derived table
    * (DuckDB allows WITH inside a subquery), identical decade
    * re-aggregation. */
  def pqOccupancySql(m: Int = 8, k: Int = 16, dim: Int = 64,
      trainIters: Int = 2): String =
    s"""SELECT CAST(length(CAST(occ AS VARCHAR)) - 1 AS BIGINT)
       |         AS occ_decade,
       |       count(*) AS n_codes,
       |       CAST(sum(occ) AS BIGINT) AS n_vecs,
       |       CAST(max(occ) AS BIGINT) AS max_occ
       |FROM (
       |  SELECT pq_code, count(*) AS occ
       |  FROM (${pqCodesSql(m, k, dim, trainIters)}) codes
       |  GROUP BY 1
       |) o
       |GROUP BY 1""".stripMargin

  /** Distributed Lloyd's k-means over the embeddings — the training pass
    * that produces [[annIvf]]'s coarse quantizer and [[pqCodes]]'s
    * codebooks for real (both currently use first-k stand-ins).
    *
    * Each iteration is ONE distributed pass: centroids ride along as
    * literal arrays (nothing shuffled to assign), assignment is a
    * codegen'd argmin projection, and the update is a single
    * partial+final aggregate of per-dimension sums — the
    * map-side-combined shape that holds at any corpus size. Only k rows
    * (k·dim longs) ever reach the driver per iteration: the justified
    * tiny collect of an iterative quantizer build.
    *
    * Cross-engine determinism (BUILDLOG round-3 lesson): per-dimension
    * sums are quantized to integer picounits (`floor(x·1e12 + 0.5)` as
    * BIGINT) so the across-row sum is exact long arithmetic in any
    * order; the new centroid component is the exact floor division
    * `floorDiv(sum, n)` (DuckDB `//` truncates, so the oracle spells
    * floor division via the positive-mod identity); the next round's
    * double centroid is `picounits · 1e-12` — the same two IEEE ops in
    * both engines. Every output column is an integer: nothing to drift.
    *
    * Empty cells drop out (standard Lloyd's); tie-breaks are
    * lowest-cell-id, exact in both engines because the scored doubles
    * are bit-identical. */
  def kmeansCentroids(spark: SparkSession, dir: String, k: Int = 8,
      iters: Int = 2): DataFrame = {
    VectorOps.register(spark)
    val emb = graft.Tables.load(spark, dir, "embeddings")
      .withColumn("v", col("embedding").cast("array<double>"))
    val dim = emb.select(size(col("v"))).head().getInt(0)
    val cents = trainKmeans(emb, k, iters, dim)

    // integer-only digest: per-cell size, exact id sum, and the centroid
    // picounit sum (recovered exactly from the held double components)
    val picoSum = cents.map { case (cell, c) =>
      (cell, c.map(x => Math.round(x * 1e12)).sum)
    }
    val picoCol = picoSum.foldRight(lit(0L)) { case ((cell, p), els) =>
      when(col("cell") === cell, lit(p)).otherwise(els)
    }
    assignCells(emb, cents).groupBy("cell")
      .agg(count(lit(1)).as("n_points"), sum(col("vec_id")).as("id_sum"))
      .withColumn("centroid_picosum", picoCol)
  }

  /** argmin_c ||v - c||² via ||c||² − 2⟨v,c⟩ over literal centroid
    * arrays; first-min tie-breaks to the lowest cell id. Pure codegen'd
    * per-row projection — nothing shuffled to assign. */
  private def assignCells(emb: DataFrame,
      cents: IndexedSeq[(Int, IndexedSeq[Double])]): DataFrame = {
    val scores = array(cents.map { case (_, c) =>
      val cl = array(c.map(lit): _*)
      call_function("dot_product", cl, cl) -
        lit(2.0) * call_function("dot_product", col("v"), cl)
    }: _*)
    val cellId = (array_position(col("scores"), array_min(col("scores"))) - 1)
      .cast("int")
    val idToCell = cents.map(_._1).zipWithIndex
      .foldRight(lit(-1)) { case ((cell, i), els) =>
        when(cellId === i, lit(cell)).otherwise(els)
      }
    emb.withColumn("scores", scores).withColumn("cell", idToCell)
      .drop("scores")
  }

  /** Per-(session, dir, k, iters) trained-quantizer cache: [[annIvf]],
    * [[pqCodes]] and [[pqAdc]] all consume the SAME k=16 quantizer —
    * training it once per session is the production shape (codebooks
    * are fitted once and shipped with the index), and the training is
    * deterministic so a cache hit changes nothing but wall-clock. The
    * digest query [[kmeansCentroids]] deliberately bypasses this so its
    * bench floor keeps measuring real training. */
  private val kmCache = new java.util.concurrent.ConcurrentHashMap[
    (Int, String, Int, Int), IndexedSeq[(Int, IndexedSeq[Double])]]()

  private def trainKmeansCached(spark: SparkSession, dir: String,
      emb: DataFrame, k: Int, iters: Int, dim: Int):
      IndexedSeq[(Int, IndexedSeq[Double])] =
    kmCache.computeIfAbsent(
      (System.identityHashCode(spark), dir, k, iters),
      _ => trainKmeans(emb, k, iters, dim))

  /** The Lloyd training loop of [[kmeansCentroids]], factored out so
    * [[annIvf]] and [[pqCodes]]/[[pqAdc]] can train their quantizers for
    * real instead of the former first-k stand-ins. Returns (cellId,
    * centroid) ascending by cellId; empty cells drop out, so callers
    * index surviving centroids by POSITION (the oracles mirror this with
    * `row_number() OVER (ORDER BY cell) - 1`). Each iteration is one
    * distributed partial+final aggregate; only k rows reach the driver
    * per iteration. Centroid components are exact floor-divided
    * picounits, so they are bit-identical cross-engine (see
    * [[kmeansCentroids]]).
    *
    * Cell LABELS are the seeds' RAW `vec_id`s — exactly the oracle
    * chain's `SELECT vec_id AS cell … WHERE vec_id < k` — NOT their
    * 0..k−1 positions. On every contiguous-id corpus the two coincide,
    * which is why a position `zipWithIndex` here survived 14 rounds of
    * gates; the first id-SPARSE corpus (the r15 sf10 mod-10 subset,
    * vec_ids 0,10,20,…) split them and every label-emitting consumer
    * (d_semantic_dup, v_kmeans, v_kmeans_purity) hash-diverged with
    * identical partitions — the silent class the reduced-oracle tier
    * exists to catch. Position-indexed consumers (`.map(_._2)` into
    * IVF/PQ codebooks) are unaffected: the raw-id ↔ position map is
    * order-preserving, matching their oracles' `row_number() OVER
    * (ORDER BY cell)` re-index. Note the seed RULE itself (`vec_id <
    * k`) is engine-symmetric by construction on any corpus — on
    * id-sparse input both engines under-seed identically (the subset
    * trains 15 of 141 derived cells); seeds-by-rank would need
    * `row_number` mirrored through every chain oracle and is a
    * semantics choice, not a correctness one. */
  private[ops] def trainKmeans(emb: DataFrame, k: Int, iters: Int,
      dim: Int): IndexedSeq[(Int, IndexedSeq[Double])] = {
    // (cellId, centroid) pairs, ascending cellId; init = first k
    // vectors, labeled by their raw vec_id (the oracle's cb0)
    var cents: IndexedSeq[(Int, IndexedSeq[Double])] =
      emb.filter(col("vec_id") < k).orderBy("vec_id")
        .select(col("vec_id"), col("v")).collect()
        .toIndexedSeq.map(r =>
          (r.getLong(0).toInt, r.getSeq[Double](1).toIndexedSeq))
    for (_ <- 1 to iters) {
      val dimSums = (0 until dim).map(i =>
        sum(floor(element_at(col("v"), i + 1) * lit(1e12) + lit(0.5))
          .cast("long")).as(s"s$i"))
      val upd = assignCells(emb, cents).groupBy("cell")
        .agg(count(lit(1)).as("n"), dimSums: _*)
        .orderBy("cell").collect()
      cents = upd.toIndexedSeq.map { r =>
        val n = r.getAs[Long]("n")
        val c = (0 until dim).map { i =>
          Math.floorDiv(r.getAs[Long](s"s$i"), n).toDouble * 1e-12
        }
        (r.getAs[Int]("cell"), c)
      }
    }
    cents
  }

  /** L2-argmin assignment CTE over codebook `cb` — row rc=1 is the
    * owning cell (lowest-cell tie-break). Shared by the kmeans chain and
    * its consumers. */
  private def kmAssignCte(cb: String, tag: String) =
    s"""a$tag AS (
       |  SELECT e.vec_id, e.v, c.cell,
       |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |           list_dot_product(c.cv, c.cv)
       |             - 2.0::DOUBLE * list_dot_product(e.v, c.cv),
       |           c.cell) AS rc
       |  FROM e CROSS JOIN $cb c
       |)""".stripMargin

  private def kmUpdCte(tag: String, dim: Int) =
    s"""u$tag AS (
       |  SELECT cell, d.i,
       |         count(*) AS n,
       |         CAST(sum(CAST(floor(v[d.i] * 1e12 + 0.5::DOUBLE) AS BIGINT)) AS BIGINT) AS s
       |  FROM a$tag, (SELECT unnest(generate_series(1, $dim)) AS i) d
       |  WHERE rc = 1
       |  GROUP BY 1, 2
       |), cb$tag AS (
       |  SELECT cell,
       |         list(CAST((s - ((s % n) + n) % n) / n AS BIGINT) * 1e-12
       |              ORDER BY i) AS cv,
       |         CAST(sum(CAST((s - ((s % n) + n) % n) / n AS BIGINT)) AS BIGINT) AS picosum
       |  FROM u$tag GROUP BY cell
       |)""".stripMargin

  /** WITH-clause fragment `e, cb0, a1, u1, cb1, …, cb<iters>` — the
    * unrolled [[trainKmeans]] loop the kmeans/IVF/PQ oracles all build
    * on. `cb<iters>` holds the trained (cell, cv, picosum) rows. */
  private def kmeansChain(k: Int, iters: Int, dim: Int): String =
    kmeansChainSeeded(k.toString, "", iters, dim)

  /** [[kmeansChain]] with `k` derived IN-SQL as
    * `max(16, round(sqrt(n)))` over the embedding table itself — the
    * corpus-proportional cell count [[semanticDup]] uses, mirrored
    * exactly so the seed set (`vec_id < k`) is engine-identical at any
    * sf without a baked literal. */
  private def kmeansChainSqrtN(iters: Int, dim: Int): String =
    kmeansChainSeeded("(SELECT k FROM kparam)",
      """kparam AS (
        |  SELECT greatest(16, CAST(floor(sqrt(CAST(count(*) AS DOUBLE))
        |    + 0.5::DOUBLE) AS INT)) AS k FROM e
        |), """.stripMargin, iters, dim)

  private def kmeansChainSeeded(kExpr: String, preCte: String, iters: Int,
      dim: Int): String = {
    val loop = (1 to iters).map { it =>
      val prev = if (it == 1) "cb0" else s"cb${it - 1}"
      s"${kmAssignCte(prev, it.toString)},\n${kmUpdCte(it.toString, dim)}"
    }.mkString(",\n")
    s"""e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |), ${preCte}cb0 AS (
       |  SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < $kExpr
       |),
       |$loop""".stripMargin
  }

  /** Oracle for [[kmeansCentroids]]: the same init / assign / quantized
    * update loop unrolled as CTEs (one assign+update pair per
    * iteration), ending in the integer digest. */
  def kmeansSql(k: Int = 8, iters: Int = 2, dim: Int = 64): String =
    s"""WITH ${kmeansChain(k, iters, dim)},
       |${kmAssignCte(s"cb$iters", "F")}
       |SELECT a.cell, count(*) AS n_points,
       |       CAST(sum(a.vec_id) AS BIGINT) AS id_sum,
       |       max(c.picosum) AS centroid_picosum
       |FROM aF a JOIN cb$iters c ON c.cell = a.cell
       |WHERE a.rc = 1
       |GROUP BY a.cell""".stripMargin

  /** K-means cluster purity vs the held labels (extension) — the
    * measure-don't-guess row for the vector tier ([[graft.ops.Dedup
    * .lshRecall]] discipline): per trained cell, how label-homogeneous
    * is it? Majority label by the total (count DESC, label ASC) order;
    * purity = majority/size through one exact integer division. Reuses
    * the session-cached quantizer ([[trainKmeansCached]]) and the same
    * literal-centroid assignment projection as [[annIvf]] — no extra
    * training, no shuffle beyond two aggregate-sized groupBys. */
  def kmeansPurity(spark: SparkSession, dir: String, k: Int = 8,
      iters: Int = 2): DataFrame = {
    VectorOps.register(spark)
    val emb = graft.Tables.load(spark, dir, "embeddings")
      .withColumn("v", col("embedding").cast("array<double>"))
    val dim = emb.select(size(col("v"))).head().getInt(0)
    val cents = trainKmeansCached(spark, dir, emb, k, iters, dim)
    val byCell = Window.partitionBy("cell")
      .orderBy(col("c").desc, col("label"))
    assignCells(emb, cents)
      .groupBy("cell", "label").agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(byCell))
      .groupBy("cell")
      .agg(sum(col("c")).as("n_points"),
        max(when(col("rk") === 1, col("label"))).as("majority_label"),
        max(when(col("rk") === 1, col("c"))).as("n_majority"))
      .withColumn("purity",
        (col("n_majority").cast("double")
          / col("n_points").cast("double")))
  }

  /** Oracle for [[kmeansPurity]] — the unrolled k-means chain plus the
    * label join. */
  def kmeansPuritySql(k: Int = 8, iters: Int = 2, dim: Int = 64): String =
    s"""WITH ${kmeansChain(k, iters, dim)},
       |${kmAssignCte(s"cb$iters", "F")},
       |asg AS (
       |  SELECT a.vec_id, a.cell FROM aF a WHERE a.rc = 1
       |), lab AS (
       |  SELECT asg.cell, e2.label, count(*) AS c
       |  FROM asg JOIN embeddings e2 USING (vec_id)
       |  GROUP BY 1, 2
       |), rk AS (
       |  SELECT cell, label, c,
       |         row_number() OVER (PARTITION BY cell
       |           ORDER BY c DESC, label) AS rk
       |  FROM lab
       |)
       |SELECT cell, CAST(sum(c) AS BIGINT) AS n_points,
       |       max(CASE WHEN rk = 1 THEN label END) AS majority_label,
       |       CAST(max(CASE WHEN rk = 1 THEN c END) AS BIGINT)
       |         AS n_majority,
       |       (CAST(max(CASE WHEN rk = 1 THEN c END) AS DOUBLE)
       |             / CAST(CAST(sum(c) AS BIGINT) AS DOUBLE)) AS purity
       |FROM rk GROUP BY 1""".stripMargin

  /** V (extension) — IVF cell-occupancy decade histogram, completing
    * the occupancy-surveillance triad ([[graft.ops.Dedup.bucketSkew]]
    * for LSH bands, [[pqOccupancy]] for the PQ code space, this for
    * the coarse quantizer): IVF probe cost is Σ(occupancy of probed
    * cells) — one mega-cell means every query that probes it scans a
    * constant fraction of the corpus and the "inverted" index stops
    * inverting. Rides the session-cached k-means and the same
    * [[kmeansPurity]] assignment projection; one cell groupBy + a
    * ≤ ~10-row re-aggregation, integer decades. */
  def ivfOccupancy(spark: SparkSession, dir: String, nCells: Int = 16,
      trainIters: Int = 2): DataFrame = {
    VectorOps.register(spark)
    val emb = graft.Tables.load(spark, dir, "embeddings")
      .withColumn("v", col("embedding").cast("array<double>"))
    val dim = emb.select(size(col("v"))).head().getInt(0)
    val cents = trainKmeansCached(spark, dir, emb, nCells, trainIters, dim)
    assignCells(emb, cents)
      .groupBy("cell").agg(count(lit(1)).as("occ"))
      .groupBy(expr("CAST(length(CAST(occ AS STRING)) - 1 AS BIGINT)")
        .as("occ_decade"))
      .agg(count(lit(1)).as("n_cells"), sum(col("occ")).as("n_vecs"),
        max(col("occ")).as("max_occ"))
  }

  /** Oracle for [[ivfOccupancy]] — the same unrolled k-means chain and
    * assignment argmin, decade re-aggregation. */
  def ivfOccupancySql(nCells: Int = 16, trainIters: Int = 2,
      dim: Int = 64): String =
    s"""WITH ${kmeansChain(nCells, trainIters, dim)},
       |${kmAssignCte(s"cb$trainIters", "F")},
       |occ AS (
       |  SELECT cell, count(*) AS occ FROM aF WHERE rc = 1 GROUP BY 1
       |)
       |SELECT CAST(length(CAST(occ AS VARCHAR)) - 1 AS BIGINT)
       |         AS occ_decade,
       |       count(*) AS n_cells,
       |       CAST(sum(occ) AS BIGINT) AS n_vecs,
       |       CAST(max(occ) AS BIGINT) AS max_occ
       |FROM occ GROUP BY 1""".stripMargin

  /** PQ asymmetric-distance (ADC) top-k search — the query path of an
    * IVF-PQ index over the [[pqCodes]] layout: each query builds an
    * m×k lookup table of per-subspace distances to every codebook entry
    * (one tiny projection per query row), then candidate distances are
    * pure table lookups summed over the m stored codes — candidates'
    * full vectors are never touched, which is the entire point of PQ at
    * 100 TB: the scan reads m log₂k bits per vector, not the vector.
    *
    * Queries (with their LUT arrays, m·k doubles each) broadcast; the
    * candidate side streams through codegen; the only shuffle is the
    * final per-query top-k. The ADC sum is a fixed left-to-right m-term
    * chain, mirrored verbatim by the oracle, so the doubles compare
    * bit-exactly cross-engine. */
  def pqAdc(spark: SparkSession, dir: String, nQueries: Int = 10,
      kNn: Int = 5, m: Int = 8, k: Int = 16,
      trainIters: Int = 2): DataFrame = {
    VectorOps.register(spark)
    val emb = graft.Tables.load(spark, dir, "embeddings")
      .withColumn("v", col("embedding").cast("array<double>"))
    val dim = emb.select(size(col("v"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim must split into $m subvectors")
    val sub = dim / m
    // same trained codebook as [[pqCodes]] (via the session cache, so
    // the two queries' codes agree AND train once)
    val cb: IndexedSeq[IndexedSeq[Double]] =
      trainKmeansCached(spark, dir, emb, k, trainIters, dim).map(_._2)
    def centLit(ci: Int, s: Int) =
      array(cb(ci).slice(s * sub, (s + 1) * sub).map(lit): _*)
    // candidate codes: same argmin-per-subspace projection as pqCodes
    def scoreCol(vc: org.apache.spark.sql.Column, s: Int) =
      array(cb.indices.map { ci =>
        call_function("dot_product", centLit(ci, s), centLit(ci, s)) -
          lit(2.0) * call_function("dot_product",
            slice(vc, s * sub + 1, sub), centLit(ci, s))
      }: _*)
    val cands = (0 until m).foldLeft(emb) { (df, s) =>
      df.withColumn(s"c$s",
        (array_position(scoreCol(col("v"), s),
          array_min(scoreCol(col("v"), s))) - 1).cast("int"))
    }.select(col("vec_id") +: (0 until m).map(s => col(s"c$s")): _*)
    // per-query LUTs: lut_s[ci] = ||c||² − 2⟨q_s, c⟩ (the same scores)
    val queries = (0 until m).foldLeft(
      emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))) { (df, s) =>
      df.withColumn(s"lut$s", scoreCol(col("qv"), s))
    }.drop("qv")
    val adc = (0 until m).map(s =>
      element_at(col(s"lut$s"), col(s"c$s") + 1)).reduce(_ + _)
    val byQ = Window.partitionBy("q_id").orderBy(col("adc"), col("vec_id"))
    cands.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("adc", adc)
      .withColumn("rnk", row_number().over(byQ))
      .filter(col("rnk") <= kNn)
      .select(col("q_id"), col("vec_id"), col("adc"), col("rnk"))
  }

  /** Oracle for [[pqAdc]]: codes via the [[pqCodesSql]] argmin CTE, LUT
    * via the same score formula on the query subvectors, ADC spelled as
    * the identical fixed-order m-term chain. */
  def pqAdcSql(nQueries: Int = 10, kNn: Int = 5, m: Int = 8, k: Int = 16,
      dim: Int = 64, trainIters: Int = 2): String = {
    val sub = dim / m
    def sl(x: String) = s"$x[s.s * $sub + 1 : (s.s + 1) * $sub]"
    val adcChain = (0 until m)
      .map(s => s"max(CASE WHEN c.s = $s THEN lv END)").mkString(" + ")
    s"""WITH ${kmeansChain(k, trainIters, dim)},
       |cb AS (
       |  SELECT CAST(row_number() OVER (ORDER BY cell) - 1 AS INT) AS ci, cv
       |  FROM cb$trainIters
       |), scored AS (
       |  SELECT e.vec_id, s.s, cb.ci,
       |    list_dot_product(${sl("cb.cv")}, ${sl("cb.cv")}) -
       |    2.0::DOUBLE * list_dot_product(${sl("e.v")}, ${sl("cb.cv")}) AS score
       |  FROM e
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${m - 1})) AS s) s
       |  CROSS JOIN cb
       |), codes AS (
       |  SELECT vec_id, s, ci FROM (
       |    SELECT vec_id, s, ci,
       |           row_number() OVER (PARTITION BY vec_id, s
       |             ORDER BY score, ci) AS rc
       |    FROM scored
       |  ) WHERE rc = 1
       |), lut AS (
       |  SELECT e.vec_id AS q_id, s.s, cb.ci,
       |    list_dot_product(${sl("cb.cv")}, ${sl("cb.cv")}) -
       |    2.0::DOUBLE * list_dot_product(${sl("e.v")}, ${sl("cb.cv")}) AS lv
       |  FROM e
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${m - 1})) AS s) s
       |  CROSS JOIN cb
       |  WHERE e.vec_id < $nQueries
       |), dist AS (
       |  SELECT l.q_id, c.vec_id, $adcChain AS adc
       |  FROM codes c
       |  JOIN lut l ON l.s = c.s AND l.ci = c.ci
       |  WHERE c.vec_id != l.q_id
       |  GROUP BY 1, 2
       |)
       |SELECT q_id, vec_id, adc, rnk FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY adc, vec_id) AS rnk
       |  FROM dist
       |) WHERE rnk <= $kNn""".stripMargin
  }

  /** The composed IVF-PQ query path — [[annIvf]]'s coarse routing over
    * [[pqAdc]]'s compressed scan, i.e. the actual FAISS-style index
    * shape: candidates are stored as (cell, m×4-bit codes); a query
    * probes its top-`nProbe` cells and ADC-scores ONLY the codes in
    * those cells. The index read per query is (probed fraction of the
    * corpus) × (m·log₂k bits per vector) — the two claims (IVF prunes
    * the scan, PQ shrinks what's scanned) multiplying, which is what
    * makes exhaustive reranking affordable at 100 TB.
    *
    * One k-means training serves both tiers (coarse quantizer and
    * sub-codebooks, via the session cache — `nCells == k` here, so the
    * cache key coincides; a production index would train residual
    * codebooks separately, which this seam accommodates by passing a
    * different k). Index build: one corpus pass (cell argmax + m code
    * argmins, all literal-codebook codegen projections), materialized
    * partitioned by cell. Probe: queries broadcast with their LUTs;
    * the only shuffle is the final per-query top-k. */
  def ivfPqAdc(spark: SparkSession, dir: String, nQueries: Int = 10,
      kNn: Int = 5, nCells: Int = 16, nProbe: Int = 4, m: Int = 8,
      trainIters: Int = 2): DataFrame = {
    VectorOps.register(spark)
    val emb = withVec(graft.Tables.load(spark, dir, "embeddings"))
      .select(col("vec_id"), col("v"), col("norm"))
    val dim = emb.select(size(col("v"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim must split into $m subvectors")
    val sub = dim / m
    val cents = trainKmeansCached(spark, dir, emb, nCells, trainIters, dim)
    val cb: IndexedSeq[IndexedSeq[Double]] = cents.map(_._2)
    val withNorm = cents.map { case (_, c) =>
      (c, math.sqrt(c.foldLeft(0.0)((a, x) => a + x * x)))
    }
    val nLive = cb.length
    val sims = array(withNorm.map { case (cv, cn) =>
      call_function("dot_product", col("v"), array(cv.map(lit): _*)) /
        (col("norm") * lit(cn))
    }: _*)
    def centLit(ci: Int, s: Int) =
      array(cb(ci).slice(s * sub, (s + 1) * sub).map(lit): _*)
    def scoreCol(vc: org.apache.spark.sql.Column, s: Int) =
      array(cb.indices.map { ci =>
        call_function("dot_product", centLit(ci, s), centLit(ci, s)) -
          lit(2.0) * call_function("dot_product",
            slice(vc, s * sub + 1, sub), centLit(ci, s))
      }: _*)
    // index build: cell + packed-code columns in one pass, stored by cell
    val n = spark.sessionState.conf.numShufflePartitions
    val index = (0 until m).foldLeft(
      emb.withColumn("sims", sims)
        .withColumn("cell",
          (array_position(col("sims"), array_max(col("sims"))) - 1).cast("int"))
        .drop("sims")) { (df, s) =>
      df.withColumn(s"c$s",
        (array_position(scoreCol(col("v"), s),
          array_min(scoreCol(col("v"), s))) - 1).cast("int"))
    }.select(col("vec_id") +: col("cell") +: (0 until m).map(s => col(s"c$s")): _*)
      .repartition(n, col("cell"))
      .localCheckpoint()
    // probe side: top-nProbe cells + per-subspace LUTs, broadcast
    val probeCells = expr(
      s"transform(slice(reverse(array_sort(zip_with(sims, " +
        s"sequence(0, ${nLive - 1}), (s, c) -> struct(s AS sim, -c AS negc)))), " +
        s"1, $nProbe), x -> CAST(-x.negc AS INT))")
    val queries = (0 until m).foldLeft(
      emb.filter(col("vec_id") < nQueries)
        .withColumn("sims", sims)
        .select(col("vec_id").as("q_id"), col("v").as("qv"),
          explode(probeCells).as("cell"))) { (df, s) =>
      df.withColumn(s"lut$s", scoreCol(col("qv"), s))
    }.drop("qv")
    val adc = (0 until m).map(s =>
      element_at(col(s"lut$s"), col(s"c$s") + 1)).reduce(_ + _)
    val byQ = Window.partitionBy("q_id").orderBy(col("adc"), col("vec_id"))
    index.join(broadcast(queries), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("adc", adc)
      .withColumn("rnk", row_number().over(byQ))
      .filter(col("rnk") <= kNn)
      .select(col("q_id"), col("vec_id"), col("adc"), col("rnk"))
  }

  /** Oracle for [[ivfPqAdc]]: one k-means chain feeding both tiers,
    * [[annIvfSql]]'s assignment/probe CTEs (renamed), [[pqAdcSql]]'s
    * codes/LUT CTEs, with the ADC scan restricted to probed cells. */
  def ivfPqAdcSql(nQueries: Int = 10, kNn: Int = 5, nCells: Int = 16,
      nProbe: Int = 4, m: Int = 8, dim: Int = 64,
      trainIters: Int = 2): String = {
    val sub = dim / m
    def sl(x: String) = s"$x[s.s * $sub + 1 : (s.s + 1) * $sub]"
    val adcChain = (0 until m)
      .map(s => s"max(CASE WHEN c.s = $s THEN lv END)").mkString(" + ")
    s"""WITH ${kmeansChain(nCells, trainIters, dim)},
       |n AS (
       |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
       |), cent AS (
       |  SELECT CAST(row_number() OVER (ORDER BY cell) - 1 AS INT) AS cell,
       |         cv, sqrt(list_dot_product(cv, cv)) AS cn
       |  FROM cb$trainIters
       |), cscored AS (
       |  SELECT n.vec_id, c.cell,
       |         row_number() OVER (PARTITION BY n.vec_id
       |           ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cn) DESC,
       |                    c.cell) AS rc
       |  FROM n, cent c
       |), assigned AS (
       |  SELECT vec_id, cell FROM cscored WHERE rc = 1
       |), probes AS (
       |  SELECT vec_id AS q_id, cell FROM cscored
       |  WHERE vec_id < $nQueries AND rc <= $nProbe
       |), cb AS (
       |  SELECT CAST(row_number() OVER (ORDER BY cell) - 1 AS INT) AS ci, cv
       |  FROM cb$trainIters
       |), qscored AS (
       |  SELECT e.vec_id, s.s, cb.ci,
       |    list_dot_product(${sl("cb.cv")}, ${sl("cb.cv")}) -
       |    2.0::DOUBLE * list_dot_product(${sl("e.v")}, ${sl("cb.cv")}) AS score
       |  FROM e
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${m - 1})) AS s) s
       |  CROSS JOIN cb
       |), codes AS (
       |  SELECT vec_id, s, ci FROM (
       |    SELECT vec_id, s, ci,
       |           row_number() OVER (PARTITION BY vec_id, s
       |             ORDER BY score, ci) AS rc
       |    FROM qscored
       |  ) WHERE rc = 1
       |), lut AS (
       |  SELECT e.vec_id AS q_id, s.s, cb.ci,
       |    list_dot_product(${sl("cb.cv")}, ${sl("cb.cv")}) -
       |    2.0::DOUBLE * list_dot_product(${sl("e.v")}, ${sl("cb.cv")}) AS lv
       |  FROM e
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${m - 1})) AS s) s
       |  CROSS JOIN cb
       |  WHERE e.vec_id < $nQueries
       |), dist AS (
       |  SELECT p.q_id, c.vec_id, $adcChain AS adc
       |  FROM codes c
       |  JOIN assigned a ON a.vec_id = c.vec_id
       |  JOIN probes p ON p.cell = a.cell
       |  JOIN lut l ON l.q_id = p.q_id AND l.s = c.s AND l.ci = c.ci
       |  WHERE c.vec_id != p.q_id
       |  GROUP BY 1, 2
       |)
       |SELECT q_id, vec_id, adc, rnk FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY adc, vec_id) AS rnk
       |  FROM dist
       |) WHERE rnk <= $kNn""".stripMargin
  }

  /** Random-hyperplane LSH buckets: `nBits` sign bits of dot products
    * against deterministic ±1 hyperplanes (derived from (dim, plane)
    * indices, so every executor regenerates them identically — nothing
    * is shipped). Bucket join → exact cosine re-rank inside buckets. */
  def annLsh(spark: SparkSession, dir: String, nQueries: Int = 10,
      k: Int = 3, nBits: Int = 8): DataFrame = {
    VectorOps.register(spark)
    val emb = withVec(graft.Tables.load(spark, dir, "embeddings"))
    // bit_j = sign(sum_i v[i] * plane(i, j)), plane in {+1, -1} — one
    // codegen'd pass over the vector ([[graft.functions.HyperplaneLshBits]])
    val bucketed = emb.withColumn("bucket", expr(s"lsh_bits(v, $nBits)"))
    val q = bucketed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("norm").as("qn"), col("bucket"))
    val c = bucketed.select(col("vec_id"), col("v").as("cv"),
      col("norm").as("cn"), col("bucket"))
    val byQ = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", expr("dot_product(qv, cv)") / (col("qn") * col("cn")))
      .withColumn("rnk", row_number().over(byQ))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("vec_id"), (col("cos")).as("cos_sim"),
        col("rnk"))
  }

  /** Label-conditional outlier triage (the mislabel / out-of-domain
    * sweep a labeled-embedding corpus gets before training): score
    * every vector by cosine to its OWN label's centroid and surface
    * the k least-typical members per label — a low score means the
    * example disagrees with its class in embedding space, the classic
    * confident-learning signal. The centroid is computed EXACTLY:
    * per-dim micro-quantized BIGINT sums (order-independent integer
    * addition — a float mean would be partition-order-dependent and
    * break the cross-engine hash), divided once at the end; the
    * ≤|labels|-row centroid table broadcasts back onto one codegen'd
    * corpus scan. The per-dim explode is the only non-flat stage —
    * |corpus|·dim rows through a partial-aggregated groupBy, the same
    * transpose shape [[kmeansCentroids]] trains with. */
  def labelOutliers(spark: SparkSession, dir: String, k: Int = 3)
      : DataFrame = {
    VectorOps.register(spark)
    val emb = withVec(graft.Tables.load(spark, dir, "embeddings"))
    val dims = emb.select(col("label"),
        posexplode(col("v")).as(Seq("d", "x")))
      .withColumn("xm", expr("CAST(round(x * 1000000) AS BIGINT)"))
    val cent = dims.groupBy("label", "d")
      .agg(sum(col("xm")).as("sm"), count(lit(1)).as("nn"))
      .groupBy("label")
      .agg(transform(
        array_sort(collect_list(struct(col("d"), col("sm"), col("nn")))),
        s => s.getField("sm").cast("double") /
          (s.getField("nn").cast("double") * lit(1000000.0))).as("c"))
    val byLabel = Window.partitionBy("label")
      .orderBy(col("cos").asc, col("vec_id"))
    emb.join(broadcast(cent), "label")
      .withColumn("cn", sqrt(expr("dot_product(c, c)")))
      .withColumn("cos", expr("dot_product(v, c)") / (col("norm") * col("cn")))
      .withColumn("rnk", row_number().over(byLabel))
      .filter(col("rnk") <= k)
      .select(col("label"), col("vec_id"),
        (col("cos")).as("cos_centroid"), col("rnk"))
  }

  /** Oracle for [[labelOutliers]] — identical micro-quantized integer
    * centroid, dims exploded via generate_series. */
  def labelOutliersSql(k: Int = 3, dim: Int = 64): String =
    s"""WITH n AS (
       |  SELECT vec_id, label, embedding::DOUBLE[] AS v,
       |         sqrt(list_dot_product(embedding::DOUBLE[],
       |                               embedding::DOUBLE[])) AS nrm
       |  FROM embeddings
       |), dims AS (
       |  SELECT label, u.i AS d,
       |         CAST(round(v[u.i] * 1000000) AS BIGINT) AS xm
       |  FROM n, (SELECT unnest(generate_series(1, $dim)) AS i) u
       |), csum AS (
       |  SELECT label, d, CAST(sum(xm) AS BIGINT) AS sm,
       |         count(*) AS nn
       |  FROM dims GROUP BY 1, 2
       |), cent AS (
       |  SELECT label,
       |         list(CAST(sm AS DOUBLE) / (CAST(nn AS DOUBLE) * 1000000.0)
       |              ORDER BY d) AS c
       |  FROM csum GROUP BY 1
       |), s AS (
       |  SELECT n.label, n.vec_id,
       |         list_dot_product(n.v, cent.c)
       |           / (n.nrm * sqrt(list_dot_product(cent.c, cent.c))) AS cos
       |  FROM n JOIN cent USING (label)
       |)
       |SELECT label, vec_id, (cos) AS cos_centroid, rnk FROM (
       |  SELECT *, row_number() OVER (PARTITION BY label
       |    ORDER BY cos ASC, vec_id) AS rnk
       |  FROM s
       |) WHERE rnk <= $k""".stripMargin

  /** Per-label embedding drift between two corpus snapshots — the
    * embedding-model regression / corpus-shift monitor: cosine between
    * each label's centroid in snapshot A and snapshot B. A re-embedded
    * corpus whose per-class centroids rotate away from their previous
    * positions breaks every downstream ANN index and classifier
    * threshold silently; this is the table that catches it. Snapshots
    * here are the deterministic vec_id parity halves (the stand-in for
    * time-ordered ingest generations). Centroids are EXACT — the
    * [[labelOutliers]] per-dim micro-quantized BIGINT sums, divided
    * once — and the final cosine is the usual correctly-rounded
    * dot/norm arithmetic, so the rounded value is engine-identical.
    * Everything after the one |corpus|·dim transpose aggregate is
    * |labels|-sized. */
  def centroidShift(spark: SparkSession, dir: String): DataFrame = {
    VectorOps.register(spark)
    val emb = withVec(graft.Tables.load(spark, dir, "embeddings"))
    val dims = emb.select(col("label"), pmod(col("vec_id"), lit(2)).as("half"),
        posexplode(col("v")).as(Seq("d", "x")))
      .withColumn("xm", expr("CAST(round(x * 1000000) AS BIGINT)"))
    val cent = dims.groupBy("label", "half", "d")
      .agg(sum(col("xm")).as("sm"), count(lit(1)).as("nn"))
      .groupBy("label", "half")
      .agg(max(col("nn")).as("n_vecs"),
        transform(
          array_sort(collect_list(struct(col("d"), col("sm"), col("nn")))),
          s => s.getField("sm").cast("double") /
            (s.getField("nn").cast("double") * lit(1000000.0))).as("c"))
    val a = cent.filter(col("half") === 0)
      .select(col("label"), col("n_vecs").as("n_even"), col("c").as("ca"))
    val b = cent.filter(col("half") === 1)
      .select(col("label"), col("n_vecs").as("n_odd"), col("c").as("cb"))
    a.join(b, "label")
      .select(col("label"), col("n_even"), col("n_odd"),
        (expr("dot_product(ca, cb)")
          / (sqrt(expr("dot_product(ca, ca)"))
            * sqrt(expr("dot_product(cb, cb)")))).as("centroid_cos"))
  }

  /** Oracle for [[centroidShift]]. */
  def centroidShiftSql(dim: Int = 64): String =
    s"""WITH n AS (
       |  SELECT vec_id, label, vec_id % 2 AS half,
       |         embedding::DOUBLE[] AS v
       |  FROM embeddings
       |), dims AS (
       |  SELECT label, half, u.i AS d,
       |         CAST(round(v[u.i] * 1000000) AS BIGINT) AS xm
       |  FROM n, (SELECT unnest(generate_series(1, $dim)) AS i) u
       |), csum AS (
       |  SELECT label, half, d, CAST(sum(xm) AS BIGINT) AS sm,
       |         count(*) AS nn
       |  FROM dims GROUP BY 1, 2, 3
       |), cent AS (
       |  SELECT label, half, CAST(max(nn) AS BIGINT) AS n_vecs,
       |         list(CAST(sm AS DOUBLE) / (CAST(nn AS DOUBLE) * 1000000.0)
       |              ORDER BY d) AS c
       |  FROM csum GROUP BY 1, 2
       |)
       |SELECT a.label, a.n_vecs AS n_even, b.n_vecs AS n_odd,
       |       (list_dot_product(a.c, b.c)
       |             / (sqrt(list_dot_product(a.c, a.c))
       |                * sqrt(list_dot_product(b.c, b.c))))
       |         AS centroid_cos
       |FROM cent a JOIN cent b
       |  ON a.label = b.label AND a.half = 0 AND b.half = 1""".stripMargin

  /** Multi-probe LSH ANN (Lv et al., VLDB 2007): each query probes its
    * own bucket PLUS every Hamming-1 neighbor (one hyperplane bit
    * flipped) — the standard recall-vs-cost dial that buys recall
    * WITHOUT more hash tables or a bigger index. A vector whose true
    * neighbor lies just across one separating hyperplane is exactly the
    * failure mode single-probe LSH pays for; flipping each bit in turn
    * recovers those misses at (nBits+1)/2^nBits of the corpus scanned
    * per query instead of a rescan. The probe fan-out is a ≤nBits+1
    * per-query explode on the BROADCAST side — the candidate corpus is
    * still scanned once, and each candidate joins at most one probe row
    * (its single bucket), so no dedup pass is needed. */
  def annLshMultiprobe(spark: SparkSession, dir: String, nQueries: Int = 10,
      k: Int = 3, nBits: Int = 8): DataFrame = {
    VectorOps.register(spark)
    val emb = withVec(graft.Tables.load(spark, dir, "embeddings"))
    val bucketed = emb.withColumn("bucket", expr(s"lsh_bits(v, $nBits)"))
    val probes = array(col("bucket") +:
      (0 until nBits).map(j => col("bucket").bitwiseXOR(lit(1L << j))): _*)
    val q = bucketed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("norm").as("qn"), explode(probes).as("bucket"))
    val c = bucketed.select(col("vec_id"), col("v").as("cv"),
      col("norm").as("cn"), col("bucket"))
    val byQ = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", expr("dot_product(qv, cv)") / (col("qn") * col("cn")))
      .withColumn("rnk", row_number().over(byQ))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("vec_id"), (col("cos")).as("cos_sim"),
        col("rnk"))
  }

  /** Recall@k of [[annLshMultiprobe]] vs exact cosine top-k — paired
    * with [[lshAnnRecall]] (same index, same k): the multiprobe hit
    * count must dominate the single-probe one, which the spec asserts;
    * the oracle pins the exact values. */
  def multiprobeRecall(spark: SparkSession, dir: String, nQueries: Int = 10,
      k: Int = 3, nBits: Int = 8): DataFrame = {
    val mp = annLshMultiprobe(spark, dir, nQueries, k, nBits)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    cosineTopK(spark, dir, nQueries, k)
      .select("q_id", "vec_id")
      .join(mp, Seq("q_id", "vec_id"), "left")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .select(col("n_exact"), col("n_hits"),
        expr("CAST(n_hits AS DOUBLE) / CAST(n_exact AS DOUBLE)")
          .as("recall"))
  }

  /** The [[annLshCtes]] chain with the query side expanded to its
    * Hamming-1 probe ring — ends in the same `s(q_id, vec_id, cos)`. */
  private def multiprobeCtes(nQueries: Int, nBits: Int, dim: Int): String = {
    val ring = (0 until nBits).map(j => s"xor(bucket, ${1L << j})")
      .mkString("[bucket, ", ", ", "]")
    val singleProbeScan =
      """), s AS (
        |  SELECT q.q_id, b.vec_id,
        |         list_dot_product(q.qv, b.v) / (q.qn * b.nrm) AS cos
        |  FROM b JOIN q ON b.bucket = q.bucket
        |  WHERE b.vec_id != q.q_id
        |)""".stripMargin
    val multiProbeScan =
      s"""), qp AS (
        |  SELECT q_id, qv, qn, unnest($ring) AS bucket FROM q
        |), s AS (
        |  SELECT qp.q_id, b.vec_id,
        |         list_dot_product(qp.qv, b.v) / (qp.qn * b.nrm) AS cos
        |  FROM b JOIN qp ON b.bucket = qp.bucket
        |  WHERE b.vec_id != qp.q_id
        |)""".stripMargin
    val base = annLshCtes(nQueries, nBits, dim)
    require(base.contains(singleProbeScan),
      "annLshCtes scan stage changed; update multiprobeCtes")
    base.replace(singleProbeScan, multiProbeScan)
  }

  /** Oracle for [[annLshMultiprobe]]. */
  def annLshMultiprobeSql(nQueries: Int = 10, k: Int = 3, nBits: Int = 8,
      dim: Int = 64): String =
    s"""WITH ${multiprobeCtes(nQueries, nBits, dim)}
       |SELECT q_id, vec_id, (cos) AS cos_sim, rnk FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY cos DESC, vec_id) AS rnk
       |  FROM s
       |) WHERE rnk <= $k""".stripMargin

  /** Oracle for [[multiprobeRecall]] — same exact-side CTE pairing as
    * [[lshAnnRecallSql]]. */
  def multiprobeRecallSql(nQueries: Int = 10, k: Int = 3, nBits: Int = 8,
      dim: Int = 64): String =
    s"""WITH ${multiprobeCtes(nQueries, nBits, dim)},
       |ann AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY cos DESC, vec_id) AS rnk
       |    FROM s) WHERE rnk <= $k
       |), ex AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.q_id, n2.vec_id, row_number() OVER (PARTITION BY q.q_id
       |      ORDER BY list_dot_product(q.qv, n2.v) / (q.qn * n2.nrm) DESC,
       |               n2.vec_id) AS rnk
       |    FROM n n2, q
       |    WHERE n2.vec_id != q.q_id) WHERE rnk <= $k
       |)
       |SELECT CAST(count(*) AS BIGINT) AS n_exact,
       |       CAST(count(a.vec_id) AS BIGINT) AS n_hits,
       |       CAST(count(a.vec_id) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |         AS recall
       |FROM ex e LEFT JOIN ann a USING (q_id, vec_id)""".stripMargin

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — semantic
    * deduplication: cluster the embedding space with the trained coarse
    * quantizer, then compare pairs ONLY within a cluster. The quadratic
    * pair blowup is per-cell (corpus/k on average, and k grows with the
    * corpus), never corpus-wide — the same reason IVF probes cells
    * instead of scanning. `nCells` defaults to 0 = DERIVED from the
    * corpus as `max(16, round(sqrt(n)))` ([[derivedCells]]), so the
    * expected cell population — and with it the per-cell pair blowup —
    * shrinks as the corpus grows instead of riding a baked literal into
    * an n²/const join; the oracle derives the identical value in-SQL
    * ([[kmeansChainSqrtN]]), so no parameter is smuggled through the
    * compare. Trains through the session quantizer cache
    * ([[trainKmeansCached]], keyed by the derived k); cell assignment
    * is the codegen'd argmin projection
    * ([[assignCells]]) — the only shuffle is the self-join on `cell`.
    * Emits the near-dup pair list (feeds [[Dedup.resolveFromPairs]]'
    * connected-components resolution like every other pair source). */
  def semanticDup(spark: SparkSession, dir: String, nCells: Int = 0,
      trainIters: Int = 2, threshold: Double = 0.35): DataFrame = {
    VectorOps.register(spark)
    val emb = withVec(graft.Tables.load(spark, dir, "embeddings"))
      .select(col("vec_id"), col("v"), col("norm"))
    val dim = emb.select(size(col("v"))).head().getInt(0)
    val cells = if (nCells > 0) nCells else derivedCells(emb.count())
    val cents = trainKmeansCached(spark, dir, emb, cells, trainIters, dim)
    val assigned = assignCells(emb, cents)
    val l = assigned.select(col("cell"), col("vec_id").as("vec_a"),
      col("v").as("va"), col("norm").as("na"))
    val r = assigned.select(col("cell"), col("vec_id").as("vec_b"),
      col("v").as("vb"), col("norm").as("nb"))
    l.join(r, Seq("cell"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", expr("dot_product(va, vb)") / (col("na") * col("nb")))
      .filter(round(col("cos"), 6) >= threshold)
      .select(col("cell"), col("vec_a"), col("vec_b"),
        round(col("cos"), 6).as("cos_sim"))
  }

  /** `max(16, round(sqrt(n)))` — the corpus-proportional cell count
    * [[semanticDup]] trains with when no explicit `nCells` is given.
    * √n balances the two costs that pull against each other: per-cell
    * pair compare (≈ n²/k for uniform cells) and quantizer
    * train/assign (≈ n·k) both land at n^1.5 — the blocked-SemDeDup
    * sweet spot. Mirrored in-SQL by [[kmeansChainSqrtN]] (same
    * correctly-rounded sqrt + 0.5 floor in both engines, so the seed
    * boundary can't straddle an ulp). */
  private[ops] def derivedCells(n: Long): Int =
    math.max(16, math.floor(math.sqrt(n.toDouble) + 0.5).toInt)

  /** Oracle for [[semanticDup]]: the unrolled k-means chain with the
    * in-SQL √n cell count ([[kmeansChainSqrtN]]; a positive `nCells`
    * bakes a literal instead), a final assignment, and a within-cell
    * self-join with the identical round-6 cosine filter. Cell ids are
    * the raw surviving k-means cell ids on both sides (no re-indexing
    * needed — Spark's [[assignCells]] carries them through). */
  def semanticDupSql(nCells: Int = 0, trainIters: Int = 2,
      threshold: Double = 0.35, dim: Int = 64): String =
    s"""WITH ${if (nCells > 0) kmeansChain(nCells, trainIters, dim)
         else kmeansChainSqrtN(trainIters, dim)},
       |${kmAssignCte(s"cb$trainIters", "F")},
       |asg AS (
       |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm, cell
       |  FROM aF WHERE rc = 1
       |)
       |SELECT a.cell, a.vec_id AS vec_a, b.vec_id AS vec_b,
       |       round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6)
       |         AS cos_sim
       |FROM asg a JOIN asg b USING (cell)
       |WHERE a.vec_id < b.vec_id
       |  AND round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6)
       |        >= ${threshold}::DOUBLE""".stripMargin

  /** Cosine RANGE search (extension) — the other half of the vector-
    * serving API next to [[cosineTopK]]: every candidate within a
    * similarity radius of each query, however many there are (radius
    * recall for dedup review queues, "more like this" feeds with a
    * quality floor). Same plan skeleton as top-k — broadcast query
    * side, codegen'd [[graft.functions.DotProduct]] scan — but with NO
    * per-query window at all: the threshold filter replaces the rank,
    * so the whole plan is one shuffle-free scan (top-k can't avoid its
    * final per-query ordering; range search can, and at 100 TB that is
    * the difference between a scan and a sort).
    *
    * The raw IEEE cosine (not the rounded display value) feeds the
    * threshold compare, and both engines build it from bit-identical
    * dot products with correctly-rounded sqrt/divide — so the boundary
    * set is engine-identical. */
  def rangeSearch(spark: SparkSession, dir: String, nQueries: Int = 5,
      minCos: Double = 0.2): DataFrame = {
    VectorOps.register(spark)
    val emb = withVec(graft.Tables.load(spark, dir, "embeddings"))
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("norm").as("qn"))
    emb.select(col("vec_id"), col("v").as("cv"), col("norm").as("cn"))
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", expr("dot_product(qv, cv)") / (col("qn") * col("cn")))
      .filter(col("cos") >= minCos)
      .select(col("q_id"), col("vec_id"), (col("cos")).as("cos_sim"))
  }

  /** Greedy k-center diversity seeds (farthest-point traversal,
    * Gonzalez 1985 — a 2-approximation to the optimal k-center cover):
    * the coreset / diversity-sampling op a curation pipeline runs to
    * pick k maximally-spread exemplars from an embedded corpus (seed
    * clusters, pick eval probes, cover a space with annotation
    * budget). Start from the lowest vec_id, then k−1 times select the
    * vector farthest (cosine distance) from the already-selected set,
    * tie-broken by vec_id.
    *
    * Scale shape: the corpus is pinned once (localCheckpoint here;
    * DISK persist on a cluster) and each round is ONE narrow
    * codegen'd scan — the r selected vectors enter as broadcast
    * literals in a `least(...)` chain, so round r costs O(n·r·d) FLOPs
    * with no shuffle, and the argmax compiles to
    * TakeOrderedAndProject (per-partition heaps + a 1-row driver
    * merge). Total driver traffic is k rows (the k-means precedent);
    * at 100 TB run the traversal over a uniform sample first
    * (k-center++), then one assignment pass — same operator shape.
    *
    * Determinism: each seed distance is the same
    * dot-product/norm-divide double in both engines, `min` over the
    * selected set involves no accumulation, and ranking uses the raw
    * IEEE value (the [[rangeSearch]] discipline); the display value
    * alone is rounded. */
  def kcenterSeeds(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    VectorOps.register(spark)
    val emb = withVec(graft.Tables.load(spark, dir, "embeddings"))
      .select(col("vec_id"), col("v"), col("norm"))
      .localCheckpoint()
    val first = emb.orderBy("vec_id").limit(1).collect()(0)
    // (rank, vec_id, rounded min-dist, vector, norm)
    var seeds = Vector[(Int, Long, Option[Double], Seq[Double], Double)](
      (1, first.getLong(0), None, first.getSeq[Double](1), first.getDouble(2)))
    var exhausted = false
    for (r <- 2 to k if !exhausted) {
      val mind = seeds.map { case (_, _, _, sv, sn) =>
        lit(1.0) -
          call_function("dot_product", col("v"), typedLit(sv)) /
            (col("norm") * lit(sn))
      }.reduce(least(_, _))
      val picked = emb
        .filter(!col("vec_id").isin(seeds.map(_._2): _*))
        .withColumn("mind", mind)
        .select(col("vec_id"), col("mind"),
          (col("mind")).as("mind6"), col("v"), col("norm"))
        .orderBy(col("mind").desc, col("vec_id")).limit(1).collect()
      if (picked.isEmpty) exhausted = true
      else {
        val row = picked(0)
        seeds :+= ((r, row.getLong(0), Some(row.getDouble(2)),
          row.getSeq[Double](3), row.getDouble(4)))
      }
    }
    import spark.implicits._
    seeds.map { case (r, id, d, _, _) => (r, id, d) }
      .toDF("seed_rank", "vec_id", "min_dist")
  }

  /** Oracle for [[kcenterSeeds]] — the greedy rounds unrolled into a
    * CTE chain (`s1 … s_k`), each round the identical
    * min-over-selected / argmax the Spark loop runs. */
  def kcenterSeedsSql(k: Int = 8): String = {
    val sb = new StringBuilder(
      """WITH n AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |         sqrt(list_dot_product(embedding::DOUBLE[],
        |                               embedding::DOUBLE[])) AS nrm
        |  FROM embeddings
        |), s1 AS (
        |  SELECT 1 AS seed_rank, vec_id, CAST(NULL AS DOUBLE) AS mind,
        |         v, nrm
        |  FROM n WHERE vec_id = (SELECT min(vec_id) FROM n))""".stripMargin)
    for (r <- 2 to k) {
      val prev = s"s${r - 1}"
      sb ++= s""",
        | d$r AS (
        |  SELECT n.vec_id,
        |         min(1 - list_dot_product(n.v, s.v) / (n.nrm * s.nrm))
        |           AS mind
        |  FROM n, $prev s GROUP BY 1
        |), p$r AS (
        |  SELECT vec_id, mind FROM d$r
        |  WHERE vec_id NOT IN (SELECT vec_id FROM $prev)
        |  ORDER BY mind DESC, vec_id LIMIT 1
        |), s$r AS (
        |  SELECT * FROM $prev UNION ALL
        |  SELECT $r AS seed_rank, n.vec_id, p.mind, n.v, n.nrm
        |  FROM n JOIN p$r p USING (vec_id))""".stripMargin
    }
    sb ++= s"""
      |SELECT CAST(seed_rank AS INTEGER) AS seed_rank, vec_id,
      |       (mind) AS min_dist
      |FROM s$k ORDER BY seed_rank""".stripMargin
    sb.toString
  }

  // ---------------------------------------------------------------------
  // Binary sign-sketch (Hamming) search
  // ---------------------------------------------------------------------

  /** Spark-side packing of the 64-dim sign pattern into two 32-bit
    * lanes, each carried in a BIGINT (`lo` = dims 1–32, `hi` = dims
    * 33–64). Two lanes instead of one 64-bit word because the oracle
    * builds the same value via `list_sum` of powers of two, and bit 63
    * would overflow BIGINT on the sum path; 2×32 keeps every
    * intermediate ≤ 2³²−1 in BOTH engines. A sum of DISTINCT powers of
    * two is exactly the bitwise OR, so the packing is deterministic. */
  private def signLaneExpr(lane: Int): String = {
    val base = lane * 32
    s"""aggregate(sequence($base, ${base + 31}), 0L,
       |  (a, i) -> a + CASE WHEN element_at(v, i + 1) > 0D
       |                THEN shiftleft(1L, i - $base) ELSE 0L END)""".stripMargin
  }

  private def withSketch(df: DataFrame): DataFrame =
    df.withColumn("slo", expr(signLaneExpr(0)))
      .withColumn("shi", expr(signLaneExpr(1)))

  /** Binary sign-sketch top-k: each embedding collapses to its 64-bit
    * sign pattern (bit i set iff v[i] > 0 — the classic SimHash/sign
    * random-projection sketch with the identity projection), and
    * nearest neighbors rank by Hamming distance `bit_count(xor)`.
    *
    * This is the 100-TB pre-filter tier below even [[quantizeInt8]]:
    * 8 bytes/vector vs 256 for the float64 form (32× compression), the
    * distance is two XOR+POPCNT ops inside whole-stage codegen, and the
    * sketch column can live in the page index of a parquet sort key.
    * At scale the serving shape is sketch-scan → Hamming shortlist →
    * exact re-rank of the shortlist ([[annLsh]] discipline); this exact
    * scan form is the oracle-checkable baseline, and
    * [[hammingRecall]] measures what the shortlist keeps. Ranking ties
    * break by `vec_id` ([[rangeSearch]] discipline). */
  def hammingTopK(spark: SparkSession, dir: String, nQueries: Int = 10,
      k: Int = 5): DataFrame = {
    val emb = withSketch(graft.Tables.load(spark, dir, "embeddings")
      .withColumn("v", col("embedding").cast("array<double>")))
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("slo").as("qlo"),
        col("shi").as("qhi"))
    val scored = emb.select(col("vec_id"), col("slo"), col("shi"))
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("hamming", expr(
        "CAST(bit_count(slo ^ qlo) + bit_count(shi ^ qhi) AS BIGINT)"))
    val byQ = Window.partitionBy("q_id")
      .orderBy(col("hamming").asc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(byQ))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("vec_id"), col("hamming"), col("rnk"))
  }

  /** DuckDB CTE producing the identical two-lane sketch relation
    * `sk(vec_id, v, nrm, slo, shi)`; shared by [[hammingTopKSql]] and
    * [[hammingRecallSql]]. */
  private def sketchCte: String =
    """WITH n AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v,
      |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
      |           AS nrm
      |  FROM embeddings
      |), sk AS (
      |  SELECT vec_id, v, nrm,
      |    CAST(list_sum(list_transform(range(0, 32), i ->
      |      CASE WHEN v[i + 1] > 0 THEN (1::BIGINT << i)
      |           ELSE 0::BIGINT END)) AS BIGINT) AS slo,
      |    CAST(list_sum(list_transform(range(32, 64), i ->
      |      CASE WHEN v[i + 1] > 0 THEN (1::BIGINT << (i - 32))
      |           ELSE 0::BIGINT END)) AS BIGINT) AS shi
      |  FROM n
      |)""".stripMargin

  /** Oracle for [[hammingTopK]] — `xor()` spelled as a function
    * (DuckDB's `^` is exponentiation). */
  def hammingTopKSql(nQueries: Int = 10, k: Int = 5): String =
    s"""$sketchCte, s AS (
       |  SELECT q.vec_id AS q_id, c.vec_id,
       |         CAST(bit_count(xor(q.slo, c.slo)) AS BIGINT) +
       |         CAST(bit_count(xor(q.shi, c.shi)) AS BIGINT) AS hamming
       |  FROM sk q, sk c
       |  WHERE q.vec_id < $nQueries AND c.vec_id != q.vec_id
       |)
       |SELECT q_id, vec_id, hamming, rnk FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |            ORDER BY hamming ASC, vec_id) AS rnk
       |  FROM s
       |) WHERE rnk <= $k""".stripMargin

  /** Recall@k of the sign-sketch Hamming shortlist against exact
    * cosine top-k — the measured-recall twin every approximate tier
    * ships ([[int8Recall]] discipline). The number answers "how much
    * of the true neighborhood survives the 32×-compressed pre-filter";
    * it is deliberately the weakest tier in the recall ladder
    * (1 bit/dim vs int8's 8), which is exactly why it must be
    * measured rather than assumed. Integer Hamming ranking with
    * vec_id tiebreak on the sketch side; the exact side is
    * [[cosineTopK]] verbatim. */
  def hammingRecall(spark: SparkSession, dir: String, nQueries: Int = 10,
      k: Int = 5): DataFrame = {
    val sketchK = hammingTopK(spark, dir, nQueries, k)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    cosineTopK(spark, dir, nQueries, k)
      .select("q_id", "vec_id")
      .join(sketchK, Seq("q_id", "vec_id"), "left")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .select(col("n_exact"), col("n_hits"),
        (col("n_hits").cast("double") / col("n_exact").cast("double"))
          .as("recall"))
  }

  /** Oracle for [[hammingRecall]]: identical sketch lanes, both top-ks,
    * hit-joined. */
  def hammingRecallSql(nQueries: Int = 10, k: Int = 5): String =
    s"""$sketchCte, hk AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id,
       |           row_number() OVER (PARTITION BY q.vec_id
       |             ORDER BY CAST(bit_count(xor(q.slo, c.slo)) AS BIGINT) +
       |                      CAST(bit_count(xor(q.shi, c.shi)) AS BIGINT) ASC,
       |                      c.vec_id) AS rnk
       |    FROM sk q, sk c
       |    WHERE q.vec_id < $nQueries AND c.vec_id != q.vec_id
       |  ) WHERE rnk <= $k
       |), bf AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id,
       |           row_number() OVER (PARTITION BY q.vec_id
       |             ORDER BY list_dot_product(q.v, c.v) / (q.nrm * c.nrm) DESC,
       |                      c.vec_id) AS rnk
       |    FROM sk q, sk c
       |    WHERE q.vec_id < $nQueries AND c.vec_id != q.vec_id
       |  ) WHERE rnk <= $k
       |)
       |SELECT CAST(count(*) AS BIGINT) AS n_exact,
       |       CAST(sum(CASE WHEN h.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |         AS BIGINT) AS n_hits,
       |       (CAST(sum(CASE WHEN h.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |           AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS recall
       |FROM bf LEFT JOIN hk h
       |  ON bf.q_id = h.q_id AND bf.vec_id = h.vec_id""".stripMargin

  /** All-vectors kNN graph via hyperplane-LSH buckets — the
    * embedding-side analogue of the MinHash mutual-kNN document graph
    * ([[graft.ops.Dedup.mutualKnn]]), and the substrate for
    * embedding-space clustering, diversity sampling, and
    * graph-propagated labels. Unlike [[annLsh]] (10 broadcast query
    * vectors), EVERY vector is a query here, so the bucket join is a
    * full shuffle join keyed on the bucket id — each bucket's
    * candidates co-locate, the pair scan is Σ|bucket|² instead of n²,
    * and the per-query top-k is one windowed rank over the
    * already-partitioned pairs. Vectors in sparse buckets may emit
    * fewer than k edges (or none) — that coverage loss is exactly what
    * [[knnGraphRecall]] measures.
    *
    * The bucket key is a fixed 12-plane hyperplane code FOLDED to
    * `ceil(n / occ)` groups by modulus (clamped to [1, 4096]) — the
    * budget-derived deterministic-sample discipline applied to bucket
    * geometry. Folding preserves code-equality (same group whenever
    * all 12 planes agree — the strongest locality signal) while
    * holding expected group occupancy at `occ` INDEPENDENT of corpus
    * size, so the pair scan stays ~`occ·n` and the shuffle-key
    * cardinality grows with n instead of being a fixed hot-key set —
    * a fixed bit count either over-partitions a small corpus (near-
    * empty graph; measured recall 0.013 at n=500 with 8 raw bits) or
    * melts into O(n²) hot buckets at 100 TB. Pure integer arithmetic
    * from the corpus count; no cross-engine-fragile log2. */
  def knnGraph(spark: SparkSession, dir: String, k: Int = 3,
      occ: Long = 128L): DataFrame = {
    VectorOps.register(spark)
    val emb = withVec(graft.Tables.load(spark, dir, "embeddings"))
    val mod = math.min(math.max((emb.count() + occ - 1) / occ, 1L), 4096L)
    val b = emb.withColumn("bucket", expr(s"lsh_bits(v, 12) % $mod"))
    val l = b.select(col("vec_id").as("q_id"), col("v").as("qv"),
      col("norm").as("qn"), col("bucket"))
    val r = b.select(col("vec_id"), col("v").as("cv"),
      col("norm").as("cn"), col("bucket"))
    val byQ = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    l.join(r, Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", expr("dot_product(qv, cv)") / (col("qn") * col("cn")))
      .withColumn("rnk", row_number().over(byQ))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("vec_id"), (col("cos")).as("cos_sim"),
        col("rnk"))
  }

  /** The bucketed relation shared by [[knnGraphSql]] and
    * [[knnGraphRecallSql]] — identical planes to [[annLshCtes]]. */
  private def knnGraphCtes(occ: Long, dim: Int, k: Int): String = {
    val bits = (0 until 12).map { j =>
      val sign = graft.functions.VectorOps.hyperplaneSignSql("(i - 1)", j)
      s"""CASE WHEN list_sum(list_transform(generate_series(1, $dim),
         |  i -> v[i] * $sign)) > 0.0::DOUBLE
         |  THEN ${1 << j} ELSE 0 END""".stripMargin
    }.mkString(" +\n      ")
    s"""n AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
       |  FROM embeddings
       |), bm AS (
       |  SELECT least(greatest((count(*) + ${occ - 1}) // $occ, 1), 4096) AS m
       |  FROM embeddings
       |), b AS (
       |  SELECT vec_id, v, nrm,
       |      ($bits) % (SELECT m FROM bm) AS bucket
       |  FROM n
       |), g AS (
       |  SELECT q_id, vec_id, cos, rnk FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id,
       |           list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos,
       |           row_number() OVER (PARTITION BY q.vec_id
       |             ORDER BY list_dot_product(q.v, c.v) / (q.nrm * c.nrm) DESC,
       |                      c.vec_id) AS rnk
       |    FROM b q JOIN b c ON q.bucket = c.bucket
       |    WHERE c.vec_id != q.vec_id
       |  ) WHERE rnk <= $k
       |)""".stripMargin
  }

  /** Oracle for [[knnGraph]]. */
  def knnGraphSql(k: Int = 3, occ: Long = 128L, dim: Int = 64): String =
    s"""WITH ${knnGraphCtes(occ, dim, k)}
       |SELECT q_id, vec_id, (cos) AS cos_sim, rnk FROM g""".stripMargin

  /** Recall of the [[knnGraph]] edge set against exact brute-force
    * top-k, measured over a DETERMINISTIC node sample (`vec_id %
    * sample_mod = 0`, the modulus derived from the corpus count so the
    * sample stays ~`budget` nodes at every scale — the
    * [[graft.ops.Dedup]] budget-derived-sample discipline, with
    * `sample_mod` emitted as an output column so readers see the
    * regime). This is the graph-build quality dial: per-query recall
    * ([[lshAnnRecall]]) doesn't see sparse-bucket coverage holes,
    * because its 10 fixed queries are never the isolated nodes. */
  def knnGraphRecall(spark: SparkSession, dir: String, k: Int = 3,
      occ: Long = 128L, budget: Long = 50L): DataFrame = {
    VectorOps.register(spark)
    val emb = withVec(graft.Tables.load(spark, dir, "embeddings"))
    val mod = math.max((emb.count() + budget - 1) / budget, 1L)
    val q = emb.filter(col("vec_id") % mod === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("norm").as("qn"))
    val byQ = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    val exact = emb.select(col("vec_id"), col("v").as("cv"),
        col("norm").as("cn"))
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", expr("dot_product(qv, cv)") / (col("qn") * col("cn")))
      .withColumn("rnk", row_number().over(byQ))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("vec_id"))
    val approx = knnGraph(spark, dir, k, occ)
      .filter(col("q_id") % mod === 0)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    exact.join(approx, Seq("q_id", "vec_id"), "left")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .select(col("n_exact"), col("n_hits"),
        (col("n_hits").cast("double") / col("n_exact").cast("double"))
          .as("recall"),
        lit(mod).as("sample_mod"))
  }

  /** Oracle for [[knnGraphRecall]] — the modulus re-derived in SQL
    * from the same count. */
  def knnGraphRecallSql(k: Int = 3, occ: Long = 128L, dim: Int = 64,
      budget: Long = 50L): String =
    s"""WITH ${knnGraphCtes(occ, dim, k)}, sm AS (
       |  SELECT greatest((count(*) + ${budget - 1}) // $budget, 1) AS m
       |  FROM embeddings
       |), bf AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id,
       |           row_number() OVER (PARTITION BY q.vec_id
       |             ORDER BY list_dot_product(q.v, c.v) / (q.nrm * c.nrm) DESC,
       |                      c.vec_id) AS rnk
       |    FROM n q, n c
       |    WHERE q.vec_id % (SELECT m FROM sm) = 0
       |      AND c.vec_id != q.vec_id
       |  ) WHERE rnk <= $k
       |), ap AS (
       |  SELECT q_id, vec_id FROM g
       |  WHERE q_id % (SELECT m FROM sm) = 0
       |)
       |SELECT CAST(count(*) AS BIGINT) AS n_exact,
       |       CAST(sum(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |         AS BIGINT) AS n_hits,
       |       (CAST(sum(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |           AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS recall,
       |       CAST((SELECT m FROM sm) AS BIGINT) AS sample_mod
       |FROM bf LEFT JOIN ap
       |  ON bf.q_id = ap.q_id AND bf.vec_id = ap.vec_id""".stripMargin

  /** Hubness (k-occurrence) histogram of the [[knnGraph]] edge set —
    * the high-dimensional pathology meter: in high intrinsic
    * dimension a few "hub" vectors appear in a disproportionate share
    * of other vectors' top-k lists while many vectors are never
    * retrieved at all (in-degree 0), which silently skews every
    * consumer of the graph (label propagation, diversity sampling,
    * dedup clustering). The histogram of in-degrees is the one-glance
    * read: a healthy corpus concentrates near k, a hubby one grows a
    * long right tail plus a fat zero bucket. Pure integer arithmetic —
    * in-degree is an exact count over the graph's edges, the zero
    * bucket comes from a left join against the full vector set, and
    * the histogram is a second exact count. Scale: rides the SAME
    * bucket-folded graph build as [[knnGraph]] (pair scan ~occ·n, the
    * budget-derived bucket discipline), then one vec_id-keyed shuffle
    * for the in-degree and one tiny histogram aggregate; output is
    * bounded by the distinct in-degree values (≤ max in-degree ≪ n). */
  def hubness(spark: SparkSession, dir: String, k: Int = 3,
      occ: Long = 128L): DataFrame = {
    val ids = graft.Tables.load(spark, dir, "embeddings").select("vec_id")
    val inDeg = knnGraph(spark, dir, k, occ)
      .groupBy(col("vec_id")).agg(count(lit(1)).as("in_deg"))
    ids.join(inDeg, Seq("vec_id"), "left")
      .withColumn("in_deg", coalesce(col("in_deg"), lit(0L)))
      .groupBy("in_deg").agg(count(lit(1)).as("n_vectors"))
  }

  /** Oracle for [[hubness]]. */
  def hubnessSql(k: Int = 3, occ: Long = 128L, dim: Int = 64): String =
    s"""WITH ${knnGraphCtes(occ, dim, k)}
       |SELECT in_deg, count(*) AS n_vectors
       |FROM (
       |  SELECT e.vec_id,
       |         CAST(coalesce(d.in_deg, 0) AS BIGINT) AS in_deg
       |  FROM embeddings e LEFT JOIN (
       |    SELECT vec_id, CAST(count(*) AS BIGINT) AS in_deg
       |    FROM g GROUP BY 1) d
       |  ON e.vec_id = d.vec_id)
       |GROUP BY 1""".stripMargin

  /** Nearest-neighbor MARGIN histogram over the [[knnGraph]] edges —
    * the retrieval-confidence meter: per query vector, the gap
    * `cos(rank-1) − cos(rank-2)` between its best and second-best
    * neighbor. A corpus whose margins pile up near zero answers every
    * kNN query ambiguously (hubness's query-side dual: [[hubness]]
    * reads who gets retrieved, this reads how decisively) — and it is
    * the quantity that decides whether an approximate index can get
    * away with lower recall: wide margins forgive candidate misses,
    * thin ones don't. The margin is a difference of the SAME two IEEE
    * cosines both engines already compute in the graph build
    * (engine-identical bit-for-bit), quantized ppm by the house
    * `round(x·10⁶) → BIGINT` rule, bucketed in 0.1-cosine decades by
    * integer division; queries with fewer than 2 in-bucket neighbors
    * carry no margin and are dropped (their count is [[hubness]]'s
    * zero/one-degree business). Rides the same bucket-folded build
    * (pair scan ~occ·n); one q_id-keyed pivot + one tiny histogram —
    * output bounded by ~20 buckets at any scale. */
  def nnMargin(spark: SparkSession, dir: String, occ: Long = 128L)
      : DataFrame = {
    val g = knnGraph(spark, dir, k = 2, occ = occ)
    g.groupBy("q_id")
      .agg(max(when(col("rnk") === 1, col("cos_sim"))).as("c1"),
        max(when(col("rnk") === 2, col("cos_sim"))).as("c2"),
        count(lit(1)).as("n"))
      .filter(col("n") === 2)
      .withColumn("margin_ppm",
        expr("CAST(round((c1 - c2) * 1000000) AS BIGINT)"))
      .groupBy(expr("margin_ppm div 100000").as("margin_decade"))
      .agg(count(lit(1)).as("n_queries"),
        min(col("margin_ppm")).as("min_ppm"),
        max(col("margin_ppm")).as("max_ppm"))
  }

  /** Oracle for [[nnMargin]]. */
  def nnMarginSql(occ: Long = 128L, dim: Int = 64): String =
    s"""WITH ${knnGraphCtes(occ, dim, 2)}
       |SELECT margin_ppm // 100000 AS margin_decade,
       |       count(*) AS n_queries,
       |       min(margin_ppm) AS min_ppm,
       |       max(margin_ppm) AS max_ppm
       |FROM (
       |  SELECT q_id,
       |         CAST(round((max(CASE WHEN rnk = 1 THEN cos END)
       |                     - max(CASE WHEN rnk = 2 THEN cos END))
       |              * 1000000) AS BIGINT) AS margin_ppm
       |  FROM g GROUP BY 1
       |  HAVING count(*) = 2
       |)
       |GROUP BY 1""".stripMargin

  /** V (extension, r15) — INT8 ORDER-FLIP rate by margin decade: for
    * every [[nnMargin]] query (k=2 coverage off the shared kNN graph),
    * does int8 scalar quantization PRESERVE the best-vs-second
    * neighbor order? [[int8Recall]] answers set overlap at top-k; this
    * answers rank stability, conditioned on the exact margin — the
    * direct empirical test of nnMargin's thesis that wide margins
    * forgive quantization and thin ones don't (flip_rate should decay
    * toward 0 up the decades; the spec asserts thick-margin sanity).
    * Both int8 cosines go through [[int8Recall]]'s exact
    * dequantization lambda (IEEE mul/div/add + half-up round,
    * engine-identical); a flip is STRICT `cos₈(a) < cos₈(b)` (int8
    * cosine ties preserve order by convention); the margin decade is
    * nnMargin's own ppm quantization. Plan: the k=2 graph pivot (the
    * nnMargin shape) + three vec_id equi-joins against the
    * reconstructed table + one histogram aggregate — every join keys
    * on vec_id so at 100 TB this is three co-partitioned hash joins;
    * output ≤ ~20 rows at any scale. */
  def int8OrderFlips(spark: SparkSession, dir: String, occ: Long = 128L)
      : DataFrame = {
    VectorOps.register(spark)
    val g = knnGraph(spark, dir, k = 2, occ = occ)
    val piv = g.groupBy("q_id")
      .agg(max(when(col("rnk") === 1, col("cos_sim"))).as("c1"),
        max(when(col("rnk") === 2, col("cos_sim"))).as("c2"),
        max(when(col("rnk") === 1, col("vec_id"))).as("a_id"),
        max(when(col("rnk") === 2, col("vec_id"))).as("b_id"),
        count(lit(1)).as("n"))
      .filter(col("n") === 2)
    val rec = withVec(graft.Tables.load(spark, dir, "embeddings"))
      .withColumn("vh", expr(
        """CASE WHEN array_max(v) = array_min(v) THEN v
          |  ELSE transform(v, x ->
          |    round((x - array_min(v)) /
          |      ((array_max(v) - array_min(v)) / 255.0D), 0) *
          |      ((array_max(v) - array_min(v)) / 255.0D) + array_min(v))
          |END""".stripMargin))
      .withColumn("hn", sqrt(expr("dot_product(vh, vh)")))
      .select(col("vec_id"), col("vh"), col("hn"))
    piv
      .join(rec.select(col("vec_id").as("q_id"), col("vh").as("qv"),
        col("hn").as("qn")), "q_id")
      .join(rec.select(col("vec_id").as("a_id"), col("vh").as("av"),
        col("hn").as("an")), "a_id")
      .join(rec.select(col("vec_id").as("b_id"), col("vh").as("bv"),
        col("hn").as("bn")), "b_id")
      .withColumn("c8a",
        expr("dot_product(qv, av)") / (col("qn") * col("an")))
      .withColumn("c8b",
        expr("dot_product(qv, bv)") / (col("qn") * col("bn")))
      .withColumn("margin_ppm",
        expr("CAST(round((c1 - c2) * 1000000) AS BIGINT)"))
      .withColumn("flip",
        when(col("c8a") < col("c8b"), 1L).otherwise(0L))
      .groupBy(expr("margin_ppm div 100000").as("margin_decade"))
      .agg(count(lit(1)).as("n_queries"), sum(col("flip")).as("n_flips"))
      .withColumn("flip_rate",
        col("n_flips").cast("double") / col("n_queries").cast("double"))
  }

  /** Oracle for [[int8OrderFlips]] — the [[nnMarginSql]] pivot joined
    * against [[int8RecallSql]]'s dequantization chain. */
  def int8OrderFlipsSql(occ: Long = 128L, dim: Int = 64): String =
    s"""WITH ${knnGraphCtes(occ, dim, 2)}, piv AS (
       |  SELECT q_id,
       |         max(CASE WHEN rnk = 1 THEN cos END) AS c1,
       |         max(CASE WHEN rnk = 2 THEN cos END) AS c2,
       |         max(CASE WHEN rnk = 1 THEN vec_id END) AS a_id,
       |         max(CASE WHEN rnk = 2 THEN vec_id END) AS b_id
       |  FROM g GROUP BY 1
       |  HAVING count(*) = 2
       |), rh AS (
       |  SELECT vec_id, vh, sqrt(list_dot_product(vh, vh)) AS hn
       |  FROM (
       |    SELECT vec_id,
       |      CASE WHEN list_max(v) = list_min(v) THEN v
       |        ELSE list_transform(v, x ->
       |          round((x - list_min(v)) /
       |            ((list_max(v) - list_min(v)) / 255.0::DOUBLE)) *
       |            ((list_max(v) - list_min(v)) / 255.0::DOUBLE)
       |            + list_min(v))
       |      END AS vh
       |    FROM n)
       |), t AS (
       |  SELECT CAST(round((piv.c1 - piv.c2) * 1000000) AS BIGINT)
       |           AS margin_ppm,
       |         CASE WHEN list_dot_product(q.vh, a.vh) / (q.hn * a.hn)
       |                 < list_dot_product(q.vh, b.vh) / (q.hn * b.hn)
       |              THEN 1 ELSE 0 END AS flip
       |  FROM piv
       |  JOIN rh q ON q.vec_id = piv.q_id
       |  JOIN rh a ON a.vec_id = piv.a_id
       |  JOIN rh b ON b.vec_id = piv.b_id
       |)
       |SELECT margin_ppm // 100000 AS margin_decade,
       |       count(*) AS n_queries,
       |       CAST(sum(flip) AS BIGINT) AS n_flips,
       |       CAST(CAST(sum(flip) AS BIGINT) AS DOUBLE)
       |         / CAST(count(*) AS DOUBLE) AS flip_rate
       |FROM t GROUP BY 1""".stripMargin

  /** Top principal component by POWER ITERATION, made fully
    * deterministic — the embedding-health "dominant direction" monitor
    * ([[dimProfile]]'s multivariate sibling): a corpus whose top PC
    * rotates between ingest generations has an embedding-model
    * regression no per-dim variance can see. Each of the `iters`
    * rounds computes `w = Σᵢ xᵢ(xᵢ·v)` with the [[trainKmeans]]
    * integer discipline — the per-row, per-dim contribution is
    * nano-quantized with the shared `floor(c·10⁹ + 0.5)` expression
    * and summed as exact BIGINTs (order-independent), so the only
    * float steps are the per-row dot (the sequential-fold
    * `dot_product`/`list_dot_product` pair, hash-proven identical) and
    * one normalize per round (÷, sqrt — both correctly rounded).
    * The seed is the exact literal `1/8` per dim (1/√64). Each round
    * is one |corpus|·64 transpose aggregate; 64 longs reach the
    * driver per round. Output: 64 loading rows plus the Rayleigh
    * eigenvalue estimate `‖w‖/n`. */
  def pcaPower(spark: SparkSession, dir: String, iters: Int = 3)
      : DataFrame = {
    VectorOps.register(spark)
    val emb = withVec(graft.Tables.load(spark, dir, "embeddings"))
    val n = emb.count()
    var vcur: IndexedSeq[Double] = IndexedSeq.fill(64)(0.125)
    var nrm = 0.0
    for (_ <- 1 to iters) {
      val vlit = array(vcur.map(lit): _*)
      val sums = emb
        .withColumn("s", call_function("dot_product", col("v"), vlit))
        .select(col("s"), posexplode(col("v")).as(Seq("d", "x")))
        .withColumn("c",
          floor(col("x") * col("s") * lit(1e9) + lit(0.5)).cast("long"))
        .groupBy("d").agg(sum(col("c")).as("sc"))
        .orderBy("d").collect()
      val t = sums.map(_.getLong(1).toDouble * 1e-9)
      nrm = math.sqrt(t.foldLeft(0.0)((a, x) => a + x * x))
      vcur = t.map(_ / nrm).toIndexedSeq
    }
    import spark.implicits._
    val lambda = nrm / n.toDouble
    vcur.zipWithIndex.map { case (x, d) => (d, x) }
      .toDF("dim", "raw")
      .select(col("dim"), (col("raw")).as("loading"),
        (lit(lambda)).as("lambda"))
  }

  /** Oracle for [[pcaPower]]: the iteration unrolled as CTE rounds,
    * each reproducing the identical nano-quantized transpose sums and
    * normalize. */
  def pcaPowerSql(iters: Int = 3, dim: Int = 64): String = {
    val seed = "[" + Seq.fill(dim)("0.125::DOUBLE").mkString(", ") + "]"
    val rounds = (1 to iters).map { k =>
      val vprev = if (k == 1) seed else s"(SELECT vv FROM w${k - 1})"
      s"""p$k AS (
         |  SELECT u.i AS d,
         |         CAST(sum(CAST(floor(e.v[u.i] *
         |             list_dot_product(e.v, $vprev) * 1e9 + 0.5::DOUBLE)
         |           AS BIGINT)) AS BIGINT) AS sc
         |  FROM e, (SELECT unnest(generate_series(1, $dim)) AS i) u
         |  GROUP BY 1
         |), t$k AS (
         |  SELECT list(CAST(sc AS DOUBLE) * 1e-9 ORDER BY d) AS tv FROM p$k
         |), w$k AS (
         |  SELECT list_transform(tv, x ->
         |           x / sqrt(list_dot_product(tv, tv))) AS vv,
         |         sqrt(list_dot_product(tv, tv)) AS nrm
         |  FROM t$k
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |),
       |$rounds
       |SELECT u.i - 1 AS dim, (vv[u.i]) AS loading,
       |       (nrm / (SELECT count(*) FROM e)) AS lambda
       |FROM w$iters, (SELECT unnest(generate_series(1, $dim)) AS i) u"""
      .stripMargin
  }

  /** Out-of-distribution top-k — the label-free novelty sweep
    * ([[labelOutliers]] without labels): every vector scored by L2
    * distance to its NEAREST trained k-means centroid, the `k` farthest
    * surfaced. Far-from-every-mode vectors are the junk embeddings,
    * encoder failures, and genuinely novel inputs a curation pass wants
    * eyeballed before they poison a mixture. Reuses the session-cached
    * quantizer ([[trainKmeansCached]], same (k=8, iters=2) key as
    * [[diversitySample]] — zero extra training); scoring is the same
    * literal-centroid codegen projection as [[annIvf]], the global
    * top-k is a distributed TakeOrdered (no global sort, no single
    * reducer), and only `k` rows see the final rank window. */
  def oodTopK(spark: SparkSession, dir: String, k: Int = 16,
      kc: Int = 8, iters: Int = 2): DataFrame = {
    VectorOps.register(spark)
    val emb = withVec(graft.Tables.load(spark, dir, "embeddings"))
    val cents = trainKmeansCached(spark, dir, emb, kc, iters, 64)
    val scores = array(cents.map { case (_, c) =>
      val cl = array(c.map(lit): _*)
      call_function("dot_product", cl, cl) -
        lit(2.0) * call_function("dot_product", col("v"), cl)
    }: _*)
    val top = emb.withColumn("scores", scores)
      .withColumn("md", array_min(col("scores")) + expr("dot_product(v, v)"))
      .select(col("vec_id"), col("md"))
      .orderBy(col("md").desc, col("vec_id"))
      .limit(k)
    val w = Window.orderBy(col("md").desc, col("vec_id"))
    top.withColumn("rnk", row_number().over(w))
      .select(col("vec_id"),
        (sqrt(greatest(col("md"), lit(0.0)))).as("ood_dist"),
        col("rnk"))
  }

  /** Oracle for [[oodTopK]] — the trained codebook CTE chain, the same
    * min-over-cells score, the same clamp-sqrt display. */
  def oodTopKSql(k: Int = 16, kc: Int = 8, iters: Int = 2): String =
    s"""WITH ${kmeansChain(kc, iters, 64)},
       |sc AS (
       |  SELECT e.vec_id,
       |         min(list_dot_product(c.cv, c.cv)
       |             - 2.0::DOUBLE * list_dot_product(e.v, c.cv)) AS m2
       |  FROM e CROSS JOIN cb$iters c
       |  GROUP BY e.vec_id
       |), scv AS (
       |  SELECT e.vec_id, s.m2 + list_dot_product(e.v, e.v) AS md
       |  FROM e JOIN sc s USING (vec_id)
       |)
       |SELECT vec_id, (sqrt(greatest(md, 0.0::DOUBLE))) AS ood_dist,
       |       rnk
       |FROM (SELECT vec_id, md,
       |             row_number() OVER (ORDER BY md DESC, vec_id) AS rnk
       |      FROM scv)
       |WHERE rnk <= $k""".stripMargin

  /** Per-cluster radius profile — the compactness QC for the trained
    * quantizer ([[kmeansPurity]]'s geometric sibling): per cell, the
    * member count and the mean/max distance to the owning centroid.
    * A ballooning mean radius is a stale codebook (retrain); one cell
    * with a huge max is an OOD magnet ([[oodTopK]] finds who). Per-row
    * distances micro-quantize through the shared `floor(d·10⁶ + 0.5)`
    * expression into exact BIGINT sums (order-independent), the means
    * divide once at the end; assignment is the cached-quantizer
    * literal projection — one codegen'd scan, |cells| output rows. */
  def clusterRadius(spark: SparkSession, dir: String, kc: Int = 8,
      iters: Int = 2): DataFrame = {
    VectorOps.register(spark)
    val emb = withVec(graft.Tables.load(spark, dir, "embeddings"))
    val cents = trainKmeansCached(spark, dir, emb, kc, iters, 64)
    val scores = array(cents.map { case (_, c) =>
      val cl = array(c.map(lit): _*)
      call_function("dot_product", cl, cl) -
        lit(2.0) * call_function("dot_product", col("v"), cl)
    }: _*)
    assignCells(emb, cents)
      .withColumn("md", array_min(scores))
      .withColumn("dm", floor(
        sqrt(greatest(col("md") + expr("dot_product(v, v)"), lit(0.0)))
          * lit(1e6) + lit(0.5)).cast("long"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_points"), sum(col("dm")).as("dist_sum_micro"),
        max(col("dm")).as("max_dist_micro"))
      .withColumn("mean_dist", expr(
        "CAST(dist_sum_micro AS DOUBLE) / (CAST(n_points AS DOUBLE) * 1000000.0)"))
  }

  /** Oracle for [[clusterRadius]] — trained codebook chain, identical
    * min-score + quantized distance. */
  def clusterRadiusSql(kc: Int = 8, iters: Int = 2): String =
    s"""WITH ${kmeansChain(kc, iters, 64)},
       |${kmAssignCte(s"cb$iters", "F")},
       |sc AS (
       |  SELECT e.vec_id,
       |         min(list_dot_product(c.cv, c.cv)
       |             - 2.0::DOUBLE * list_dot_product(e.v, c.cv)) AS m2
       |  FROM e CROSS JOIN cb$iters c
       |  GROUP BY e.vec_id
       |), own AS (
       |  SELECT vec_id, cell FROM aF WHERE rc = 1
       |), dm AS (
       |  SELECT o.cell,
       |         CAST(floor(sqrt(greatest(s.m2 + list_dot_product(e.v, e.v),
       |             0.0::DOUBLE)) * 1e6 + 0.5::DOUBLE) AS BIGINT) AS d
       |  FROM e JOIN sc s USING (vec_id) JOIN own o USING (vec_id)
       |)
       |SELECT cell, count(*) AS n_points,
       |       CAST(sum(d) AS BIGINT) AS dist_sum_micro,
       |       max(d) AS max_dist_micro,
       |       CAST(CAST(sum(d) AS BIGINT) AS DOUBLE)
       |         / (CAST(count(*) AS DOUBLE) * 1000000.0) AS mean_dist
       |FROM dm GROUP BY 1""".stripMargin

  /** V (extension) — PQ reconstruction distortion per SUBSPACE: the
    * mean squared error `‖v_s − c*(v_s)‖²` of each vector's assigned
    * sub-codeword — the quantization-quality meter that completes the
    * PQ self-surveillance set ([[pqCodes]] assigns, [[pqOccupancy]]
    * watches code balance, [[pqAdc]] measures end-to-end recall; this
    * measures WHERE the approximation error lives). A subspace whose
    * distortion dwarfs the others is under-clustered (raise its k) or
    * carries junk dimensions — the per-axis diagnosis ADC recall alone
    * can't give.
    *
    * Exactness: per-row per-subspace error is the deterministic
    * `min(score) + ⟨v_s, v_s⟩` dot-product chain, nano-quantized per
    * row ([[trainKmeans]] discipline) so the corpus mean is an exact
    * integer sum ÷ one double divide. Rides the session-cached
    * quantizer; one corpus scan (m per-row array expressions, no
    * shuffle before the m-row aggregate). */
  def pqDistortion(spark: SparkSession, dir: String, m: Int = 8,
      k: Int = 16, trainIters: Int = 2): DataFrame = {
    VectorOps.register(spark)
    val emb = graft.Tables.load(spark, dir, "embeddings")
      .withColumn("v", col("embedding").cast("array<double>"))
    val dim = emb.select(size(col("v"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim must split into $m subvectors")
    val sub = dim / m
    val cb: IndexedSeq[IndexedSeq[Double]] =
      trainKmeansCached(spark, dir, emb, k, trainIters, dim).map(_._2)
    def centLit(ci: Int, s: Int) =
      array(cb(ci).slice(s * sub, (s + 1) * sub).map(lit): _*)
    def scoreCol(s: Int) = array(cb.indices.map { ci =>
      call_function("dot_product", centLit(ci, s), centLit(ci, s)) -
        lit(2.0) * call_function("dot_product",
          slice(col("v"), s * sub + 1, sub), centLit(ci, s))
    }: _*)
    val errCols = (0 until m).map { s =>
      val vs = slice(col("v"), s * sub + 1, sub)
      floor(greatest(array_min(scoreCol(s)) +
        call_function("dot_product", vs, vs), lit(0.0)) * lit(1e9)
        + lit(0.5)).cast("long")
    }
    emb.select(posexplode(array(errCols: _*)).as(Seq("subspace", "e9")))
      .groupBy("subspace")
      .agg(count(lit(1)).as("n_vecs"), sum(col("e9")).as("err_sum_nano"),
        max(col("e9")).as("max_err_nano"))
      .withColumn("mean_sq_err", expr(
        "CAST(err_sum_nano AS DOUBLE) " +
          "/ (CAST(n_vecs AS DOUBLE) * 1000000000.0)"))
  }

  /** Oracle for [[pqDistortion]] — the [[pqCodesSql]] scored/best CTEs
    * with the identical nano quantization. */
  def pqDistortionSql(m: Int = 8, k: Int = 16, dim: Int = 64,
      trainIters: Int = 2): String = {
    val sub = dim / m
    def sl(x: String) = s"$x[s.s * $sub + 1 : (s.s + 1) * $sub]"
    s"""WITH ${kmeansChain(k, trainIters, dim)},
       |cb AS (
       |  SELECT CAST(row_number() OVER (ORDER BY cell) - 1 AS INT) AS ci,
       |         cv
       |  FROM cb$trainIters
       |), scored AS (
       |  SELECT e.vec_id, s.s, cb.ci,
       |    list_dot_product(${sl("cb.cv")}, ${sl("cb.cv")}) -
       |    2.0::DOUBLE * list_dot_product(${sl("e.v")}, ${sl("cb.cv")})
       |      AS score,
       |    list_dot_product(${sl("e.v")}, ${sl("e.v")}) AS vv
       |  FROM e
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${m - 1})) AS s) s
       |  CROSS JOIN cb
       |), best AS (
       |  SELECT vec_id, s, score, vv,
       |         row_number() OVER (PARTITION BY vec_id, s
       |           ORDER BY score, ci) AS rc
       |  FROM scored
       |), e9 AS (
       |  SELECT s AS subspace,
       |         CAST(floor(greatest(score + vv, 0.0::DOUBLE) * 1e9
       |           + 0.5::DOUBLE) AS BIGINT) AS e9
       |  FROM best WHERE rc = 1
       |)
       |SELECT subspace, count(*) AS n_vecs,
       |       CAST(sum(e9) AS BIGINT) AS err_sum_nano,
       |       max(e9) AS max_err_nano,
       |       CAST(CAST(sum(e9) AS BIGINT) AS DOUBLE)
       |         / (CAST(count(*) AS DOUBLE) * 1000000000.0) AS mean_sq_err
       |FROM e9 GROUP BY 1""".stripMargin
  }

  /** V (extension) — centroid-based (simplified) silhouette per trained
    * cell: for every vector, `a` = distance to its OWN (nearest)
    * centroid, `b` = distance to the second-nearest, score
    * `s = (b−a)/max(a,b) ∈ [0,1]` — the separation-vs-cohesion QC that
    * tells a curation pass whether the k-means cells the IVF/diversity
    * tiers ride are real modes or arbitrary cuts (low mean silhouette =
    * the quantizer is slicing one blob). The full-pairwise silhouette
    * is O(n²) and needless here — against CENTROIDS it is one
    * map-side projection over the cached quantizer, the
    * [[clusterRadius]] shape.
    *
    * Exactness: per-row distances are deterministic dot-product chains
    * (sqrt correctly rounded); the per-CELL mean quantizes each score
    * to ppm BIGINT first (`floor(s·10⁶ + ½)` — the [[trainKmeans]]
    * order-free discipline) so the aggregate is exact-integer, then
    * one double division at emit. Unrounded by the r14 audit contract.
    * One corpus scan, |cells| rows out. */
  def silhouette(spark: SparkSession, dir: String, kc: Int = 8,
      iters: Int = 2): DataFrame = {
    VectorOps.register(spark)
    val emb = withVec(graft.Tables.load(spark, dir, "embeddings"))
    val cents = trainKmeansCached(spark, dir, emb, kc, iters, 64)
    require(cents.length >= 2, "silhouette needs at least 2 live cells")
    val scores = array(cents.map { case (_, c) =>
      val cl = array(c.map(lit): _*)
      call_function("dot_product", cl, cl) -
        lit(2.0) * call_function("dot_product", col("v"), cl)
    }: _*)
    assignCells(emb, cents)
      .withColumn("srt", array_sort(scores))
      .withColumn("vv", expr("dot_product(v, v)"))
      .withColumn("a",
        sqrt(greatest(expr("element_at(srt, 1)") + col("vv"), lit(0.0))))
      .withColumn("b",
        sqrt(greatest(expr("element_at(srt, 2)") + col("vv"), lit(0.0))))
      .withColumn("sq", expr(
        "CASE WHEN greatest(a, b) = 0.0D THEN 0L ELSE " +
          "CAST(floor((b - a) / greatest(a, b) * 1000000.0D + 0.5D) " +
          "AS BIGINT) END"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_points"), sum(col("sq")).as("sil_sum_ppm"))
      .withColumn("mean_silhouette", expr(
        "CAST(sil_sum_ppm AS DOUBLE) / (CAST(n_points AS DOUBLE) * 1000000.0)"))
  }

  /** Oracle for [[silhouette]] — identical unrolled training, nearest/
    * second-nearest by the same squared-offset ordering, identical ppm
    * quantization. */
  def silhouetteSql(kc: Int = 8, iters: Int = 2): String =
    s"""WITH ${kmeansChain(kc, iters, 64)},
       |${kmAssignCte(s"cb$iters", "F")},
       |ds AS (
       |  SELECT e.vec_id,
       |         list_dot_product(c.cv, c.cv)
       |           - 2.0::DOUBLE * list_dot_product(e.v, c.cv) AS m2,
       |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |           list_dot_product(c.cv, c.cv)
       |             - 2.0::DOUBLE * list_dot_product(e.v, c.cv),
       |           c.cell) AS rn
       |  FROM e CROSS JOIN cb$iters c
       |), ab AS (
       |  SELECT d1.vec_id,
       |         sqrt(greatest(d1.m2 + list_dot_product(e.v, e.v),
       |           0.0::DOUBLE)) AS a,
       |         sqrt(greatest(d2.m2 + list_dot_product(e.v, e.v),
       |           0.0::DOUBLE)) AS b
       |  FROM (SELECT vec_id, m2 FROM ds WHERE rn = 1) d1
       |  JOIN (SELECT vec_id, m2 FROM ds WHERE rn = 2) d2 USING (vec_id)
       |  JOIN e USING (vec_id)
       |), own AS (SELECT vec_id, cell FROM aF WHERE rc = 1),
       |sq AS (
       |  SELECT o.cell,
       |         CASE WHEN greatest(a, b) = 0.0::DOUBLE THEN 0
       |              ELSE CAST(floor((b - a) / greatest(a, b)
       |                * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT)
       |         END AS sq
       |  FROM ab JOIN own o USING (vec_id)
       |)
       |SELECT cell, count(*) AS n_points,
       |       CAST(sum(sq) AS BIGINT) AS sil_sum_ppm,
       |       CAST(CAST(sum(sq) AS BIGINT) AS DOUBLE)
       |         / (CAST(count(*) AS DOUBLE) * 1000000.0) AS mean_silhouette
       |FROM sq GROUP BY 1""".stripMargin

  /** V (extension) — Davies–Bouldin per-cluster worst-overlap ratio:
    * `DB_i = max_{j≠i} (S_i + S_j) / d(c_i, c_j)` with S the mean
    * point-to-own-centroid distance and d the centroid separation — the
    * "which two cells should merge" counterpart of [[silhouette]]'s
    * "are cells coherent". Scatters reuse [[clusterRadius]]'s exact
    * micro-quantized sums (one corpus scan, session-shared quantizer);
    * everything after is |cells|²-sized. Centroid separations are
    * computed driver-side with the list_dot_product sequential fold on
    * the exact picounit centroids — bit-identical to the oracle's —
    * and shipped as a broadcast literal table. Degenerate duplicate
    * centroids (d = 0) fail LOUDLY and identically in both engines
    * rather than emitting ±inf. */
  def daviesBouldin(spark: SparkSession, dir: String, kc: Int = 8,
      iters: Int = 2): DataFrame = {
    val cents = trainKmeansCached(spark, dir,
      withVec(graft.Tables.load(spark, dir, "embeddings")), kc, iters, 64)
    val scatter = clusterRadius(spark, dir, kc, iters)
      .select(col("cell"), col("n_points"), col("dist_sum_micro"))
    def dot(a: IndexedSeq[Double], b: IndexedSeq[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val pairs = for {
      (ci, vi) <- cents; (cj, vj) <- cents if ci != cj
    } yield (ci, cj,
      math.sqrt(math.max(
        dot(vi, vi) - 2.0 * dot(vi, vj) + dot(vj, vj), 0.0)))
    import spark.implicits._
    val pdf = pairs.toDF("cell", "cell_j", "d_ij")
    scatter.join(broadcast(pdf), "cell")
      .join(broadcast(scatter.select(col("cell").as("cell_j"),
        col("n_points").as("nj"), col("dist_sum_micro").as("dsj"))),
        "cell_j")
      .filter(expr(
        "assert_true(d_ij > 0.0D, 'davies_bouldin: duplicate trained " +
          "centroids — cell separation is zero') IS NULL"))
      .withColumn("r", expr(
        "(CAST(dist_sum_micro AS DOUBLE) " +
          "/ (CAST(n_points AS DOUBLE) * 1000000.0) " +
          "+ CAST(dsj AS DOUBLE) / (CAST(nj AS DOUBLE) * 1000000.0)) " +
          "/ d_ij"))
      .groupBy("cell")
      .agg(max(col("n_points")).as("n_points"), max(col("r")).as("db_ratio"))
  }

  /** Oracle for [[daviesBouldin]] — the [[clusterRadiusSql]] scatter
    * CTEs + |cells|² separations, loud on zero separation. */
  def daviesBouldinSql(kc: Int = 8, iters: Int = 2): String =
    s"""WITH ${kmeansChain(kc, iters, 64)},
       |${kmAssignCte(s"cb$iters", "F")},
       |sc AS (
       |  SELECT e.vec_id,
       |         min(list_dot_product(c.cv, c.cv)
       |             - 2.0::DOUBLE * list_dot_product(e.v, c.cv)) AS m2
       |  FROM e CROSS JOIN cb$iters c
       |  GROUP BY e.vec_id
       |), own AS (
       |  SELECT vec_id, cell FROM aF WHERE rc = 1
       |), dm AS (
       |  SELECT o.cell,
       |         CAST(floor(sqrt(greatest(s.m2 + list_dot_product(e.v, e.v),
       |             0.0::DOUBLE)) * 1e6 + 0.5::DOUBLE) AS BIGINT) AS d
       |  FROM e JOIN sc s USING (vec_id) JOIN own o USING (vec_id)
       |), sca AS (
       |  SELECT cell, count(*) AS n_points,
       |         CAST(sum(d) AS BIGINT) AS ds
       |  FROM dm GROUP BY 1
       |), pd AS (
       |  SELECT a.cell AS cell, b.cell AS cell_j,
       |         sqrt(greatest(list_dot_product(a.cv, a.cv)
       |           - 2.0::DOUBLE * list_dot_product(a.cv, b.cv)
       |           + list_dot_product(b.cv, b.cv), 0.0::DOUBLE)) AS dij
       |  FROM cb$iters a JOIN cb$iters b ON a.cell <> b.cell
       |)
       |SELECT s1.cell, s1.n_points,
       |       max(CASE WHEN pd.dij = 0.0::DOUBLE
       |                THEN CAST(error('davies_bouldin: duplicate trained '
       |                     || 'centroids') AS DOUBLE)
       |                ELSE (CAST(s1.ds AS DOUBLE)
       |                      / (CAST(s1.n_points AS DOUBLE) * 1000000.0)
       |                      + CAST(s2.ds AS DOUBLE)
       |                        / (CAST(s2.n_points AS DOUBLE) * 1000000.0))
       |                     / pd.dij END) AS db_ratio
       |FROM sca s1
       |JOIN pd ON pd.cell = s1.cell
       |JOIN sca s2 ON s2.cell = pd.cell_j
       |GROUP BY 1, 2""".stripMargin

  /** Cluster-stratified diversity sample — the deterministic
    * counterpart of "sample `budget` embeddings but keep every mode of
    * the distribution represented": assign the corpus to the trained
    * k-means cells (the session-cached quantizer —
    * [[trainKmeansCached]], zero extra training), give each cell a
    * PROPORTIONAL quota `(budget·n_c) div n_total` (floor allocation —
    * the emitted sample can undershoot `budget` by < k rows, never
    * overshoot), and pick each cell's members by salted-md5 order (the
    * [[graft.ops.Dedup]] hash-sampling discipline: deterministic,
    * engine-identical, and uncorrelated with vec_id ingest order). A
    * uniform random sample would silently drop small modes — exactly
    * the examples a finetuning mixture is short of; stratifying by the
    * learned cells is the standard fix, and everything here is one
    * broadcast-assignment scan plus a cell-keyed rank. */
  def diversitySample(spark: SparkSession, dir: String, k: Int = 8,
      iters: Int = 2, budget: Long = 64L): DataFrame = {
    VectorOps.register(spark)
    val emb = graft.Tables.load(spark, dir, "embeddings")
      .withColumn("v", col("embedding").cast("array<double>"))
    val cents = trainKmeansCached(spark, dir, emb, k, iters, 64)
    val assigned = assignCells(emb, cents).select(col("vec_id"), col("cell"))
    val cellN = assigned.groupBy("cell").agg(count(lit(1)).as("n_c"))
    val total = assigned.agg(count(lit(1)).as("n_total"))
    val byCell = Window.partitionBy("cell").orderBy(col("hv"), col("vec_id"))
    assigned
      .withColumn("hv", expr(
        "CAST(conv(substring(md5(CAST(vec_id AS STRING)), 1, 8), 16, 10) " +
          "AS BIGINT)"))
      .withColumn("rnk", row_number().over(byCell))
      .join(broadcast(cellN), "cell")
      .crossJoin(broadcast(total))
      .filter(col("rnk") <= expr(s"($budget * n_c) div n_total"))
      .select(col("cell"), col("vec_id"), col("rnk"), col("n_c"))
  }

  /** Oracle for [[diversitySample]] — the unrolled kmeans chain, the
    * same hex-parsed md5 order, the same floor quota. */
  def diversitySampleSql(k: Int = 8, iters: Int = 2,
      budget: Long = 64L): String =
    s"""WITH ${kmeansChain(k, iters, 64)},
       |${kmAssignCte(s"cb$iters", "F")},
       |asg AS (
       |  SELECT vec_id, cell FROM aF WHERE rc = 1
       |), cn AS (
       |  SELECT cell, count(*) AS n_c FROM asg GROUP BY 1
       |), tt AS (
       |  SELECT count(*) AS n_total FROM asg
       |), rk AS (
       |  SELECT cell, vec_id,
       |         row_number() OVER (PARTITION BY cell ORDER BY
       |           ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT,
       |           vec_id) AS rnk
       |  FROM asg
       |)
       |SELECT r.cell, r.vec_id, r.rnk, c.n_c
       |FROM rk r JOIN cn c USING (cell), tt
       |WHERE r.rnk <= ($budget * c.n_c) // tt.n_total""".stripMargin

  /** Norm-distribution histogram — the third leg of the embedding
    * health triad ([[dimProfile]]: per-dim moments; [[pcaPower]]:
    * dominant direction; this: the norm marginal). Un-normalized
    * encoders drift in norm before they drift in direction, and norm
    * outliers break MIPS/IVF calibration silently. Bucket =
    * `floor(‖v‖·10)` clamped to 30 — sqrt is correctly rounded and the
    * scale/floor are shared expressions, so bucketing is
    * engine-identical. One codegen'd scan, ≤ 31 rows out. */
  def normHist(spark: SparkSession, dir: String): DataFrame = {
    VectorOps.register(spark)
    withVec(graft.Tables.load(spark, dir, "embeddings"))
      .withColumn("bkt",
        expr("least(CAST(floor(norm * 10) AS BIGINT), 30)"))
      .groupBy("bkt").agg(count(lit(1)).as("n_vecs"))
  }

  /** Oracle for [[normHist]]. */
  val normHistSql: String =
    """SELECT least(CAST(floor(sqrt(list_dot_product(
      |         embedding::DOUBLE[], embedding::DOUBLE[])) * 10) AS BIGINT),
      |       30) AS bkt,
      |       count(*) AS n_vecs
      |FROM embeddings GROUP BY 1""".stripMargin

  /** Per-dimension embedding health profile — the monitor an embedding
    * pipeline runs on every ingest generation: for each of the 64
    * dims, exact micro-quantized moment sums (the [[labelOutliers]]
    * centroid discipline — BIGINT Σx and Σx², order-independent),
    * range, a derived mean/variance, and a `dead` flag
    * (min = max — the dim carries no information). Dead dims, variance
    * collapse, and clipped ranges are the classic silent
    * embedding-model regressions; they break ANN recall without any
    * downstream error. The raw sums are the oracle-exact columns; the
    * mean/variance derive from them through correctly-rounded IEEE
    * casts/div/mul only (deterministic cross-engine even where Σx²
    * exceeds 2⁵³ — CAST is itself correctly rounded, so both engines
    * start from the identical double). One |corpus|·64 transpose
    * through a partial-aggregated groupBy; output is 64 rows at any
    * corpus size. */
  def dimProfile(spark: SparkSession, dir: String): DataFrame = {
    val emb = graft.Tables.load(spark, dir, "embeddings")
      .withColumn("v", col("embedding").cast("array<double>"))
    emb.select(posexplode(col("v")).as(Seq("d", "x")))
      .withColumn("xm", expr("CAST(round(x * 1000000) AS BIGINT)"))
      .groupBy("d")
      .agg(count(lit(1)).as("n"), sum(col("xm")).as("s1"),
        sum(expr("xm * xm")).as("s2"),
        min(col("xm")).as("min_micro"), max(col("xm")).as("max_micro"))
      // Overflow guard (ADVICE r11): Spark's non-ANSI BIGINT sum wraps
      // silently past 2^63 while DuckDB widens to HUGEINT — a silent
      // cross-engine divergence. Σxm² ≤ n·mx², so asserting
      // n·mx² ≤ Long.MaxValue (on the 64-row aggregate, from the
      // wrap-proof n/min/max) proves s2 could not have wrapped; past
      // the bound (~9.2M unit-range rows per dim) the op FAILS LOUDLY
      // instead of diverging. The bound is checked in pure DIV form
      // (nested floor divisions), so the guard itself cannot overflow.
      .withColumn("mxa", greatest(abs(col("min_micro")),
        abs(col("max_micro")), lit(1L)))
      .filter(expr(
        "assert_true(" +
          "n <= (9223372036854775807 div mxa) div mxa, " +
          "'dim_profile: corpus too large for exact BIGINT moment sums " +
          "(s2 would overflow 2^63) — shard the corpus or widen to " +
          "DECIMAL(38,0)') IS NULL"))
      .drop("mxa")
      .select(col("d").as("dim"), col("n"), col("s1"), col("s2"),
        col("min_micro"), col("max_micro"),
        expr("CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)")
          .as("mean"),
        expr("""(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
               | - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
               |   * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
               | / 1000000000000.0""".stripMargin).as("variance"),
        (col("min_micro") === col("max_micro")).as("dead"))
  }

  /** Oracle for [[dimProfile]] — identical quantization, sums, and
    * derived-moment expression text. */
  def dimProfileSql(dim: Int = 64): String =
    s"""WITH e AS (
       |  SELECT embedding::DOUBLE[] AS v FROM embeddings
       |), dims AS (
       |  SELECT u.i - 1 AS dim,
       |         CAST(round(v[u.i] * 1000000) AS BIGINT) AS xm
       |  FROM e, (SELECT unnest(generate_series(1, $dim)) AS i) u
       |), a AS (
       |  SELECT dim, count(*) AS n, CAST(sum(xm) AS BIGINT) AS s1,
       |         CAST(sum(xm * xm) AS BIGINT) AS s2,
       |         min(xm) AS min_micro, max(xm) AS max_micro
       |  FROM dims GROUP BY 1
       |)
       |SELECT dim, n, s1, s2, min_micro, max_micro,
       |       CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) AS mean,
       |       (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
       |        - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
       |          * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
       |        / 1000000000000.0 AS variance,
       |       min_micro = max_micro AS dead
       |FROM a""".stripMargin

  /** Oracle for [[rangeSearch]] — same unrounded threshold compare. */
  def rangeSearchSql(nQueries: Int = 5, minCos: Double = 0.2): String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |), n AS (
       |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
       |), q AS (
       |  SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n
       |  WHERE vec_id < $nQueries
       |)
       |SELECT q.q_id, n.vec_id,
       |       (list_dot_product(q.qv, n.v) / (q.qn * n.nrm))
       |         AS cos_sim
       |FROM q, n
       |WHERE n.vec_id != q.q_id
       |  AND list_dot_product(q.qv, n.v) / (q.qn * n.nrm)
       |        >= ${minCos}::DOUBLE""".stripMargin

  /** V (extension) — Maximal Marginal Relevance selection: the
    * diversity re-ranker every RAG retriever and dataset-curation
    * sampler runs after top-k (plain nearest neighbors are redundant;
    * MMR greedily picks `argmax λ·sim(q,d) − (1−λ)·max_{s∈S}
    * sim(d,s)` so each pick is relevant AND far from what's already
    * chosen). Two-tier, the 100 TB shape: the DISTRIBUTED stage is the
    * top-`poolN` candidate search (TakeOrdered over the full corpus —
    * swaps for the ANN tier at scale); the greedy rounds then run on
    * the bounded pool (≤ poolN² pairwise cosines, broadcast-sized) as
    * `k` unrolled argmax stages — no driver-side collect, the rounds
    * are chained plans over the pinned pool. Round 1's diversity term
    * is vacuous (empty selected set → score = λ·sim(q,d)). Cosines
    * compare as raw doubles (sequential dot products are bit-identical
    * cross-engine — the [[rangeSearch]] discipline); ties break on
    * vec_id; `round(·,6)` is display-only. */
  def mmrSelect(spark: SparkSession, dir: String, poolN: Int = 50,
      k: Int = 5, lam: Double = 0.7): DataFrame = {
    VectorOps.register(spark)
    val emb = withVec(graft.Tables.load(spark, dir, "embeddings"))
    val q = emb.filter(col("vec_id") === 0)
      .select(col("v").as("qv"), col("norm").as("qn"))
    val pool = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .withColumn("cosq",
        expr("dot_product(qv, v)") / (col("qn") * col("norm")))
      .select(col("vec_id"), col("v"), col("norm"), col("cosq"))
      .orderBy(col("cosq").desc, col("vec_id")).limit(poolN)
      .localCheckpoint()
    // r17 (guide §1.2): pairs is referenced by every greedy round and
    // sel_{r-1} appears TWICE in round r's plan (the union branch and
    // next's joins), so the un-truncated chain re-executed earlier
    // rounds ~2^k times (21 jobs, 2.46 s wall for 0.65 s of executor
    // work at sf0.1). Checkpointing the poolN²-row pair table once and
    // the ≤k-row selection per round keeps every round's plan linear;
    // the selected rows and scores are computed by the identical
    // expressions.
    val pairs = pool
      .select(col("vec_id").as("ia"), col("v").as("va"),
        col("norm").as("na"))
      .crossJoin(pool.select(col("vec_id").as("ib"), col("v").as("vb"),
        col("norm").as("nb")))
      .filter(col("ia") =!= col("ib"))
      .withColumn("c", expr("dot_product(va, vb)") / (col("na") * col("nb")))
      .select("ia", "ib", "c")
      .localCheckpoint()
    var sel = pool.orderBy(col("cosq").desc, col("vec_id")).limit(1)
      .select(col("vec_id"), lit(1L).as("rank"),
        (lit(lam) * col("cosq")).as("score"))
      .localCheckpoint()
    for (r <- 2 to k) {
      val selIds = sel.select(col("vec_id").as("ib"))
      val next = pool
        .join(selIds.withColumnRenamed("ib", "vec_id"), Seq("vec_id"),
          "left_anti")
        .join(pairs.join(selIds, Seq("ib")), col("vec_id") === col("ia"))
        .groupBy(col("vec_id"), col("cosq"))
        .agg(max(col("c")).as("maxc"))
        .withColumn("score",
          lit(lam) * col("cosq") - lit(1.0 - lam) * col("maxc"))
        .orderBy(col("score").desc, col("vec_id")).limit(1)
        .select(col("vec_id"), lit(r.toLong).as("rank"), col("score"))
      sel = sel.unionByName(next).localCheckpoint()
    }
    sel.select(col("rank"), col("vec_id"),
      (col("score")).as("mmr_score"))
  }

  /** Oracle for [[mmrSelect]] — the greedy rounds unrolled as chained
    * CTEs, each `AS MATERIALIZED` (DuckDB inlines multiply-referenced
    * CTEs into exponential plans otherwise). */
  def mmrSelectSql(poolN: Int = 50, k: Int = 5, lam: Double = 0.7): String = {
    val lamS = s"${lam}::DOUBLE"
    val dlamS = s"${1.0 - lam}::DOUBLE"
    def selUnion(r: Int): String =
      (1 to r).map(i => s"SELECT vec_id FROM s$i").mkString(" UNION ALL ")
    val rounds = (2 to k).map { r =>
      s"""s$r AS MATERIALIZED (
         |  SELECT p.vec_id, $r AS rank,
         |         $lamS * p.cosq - $dlamS * max(pr.c) AS score
         |  FROM pool p JOIN pairs pr ON pr.ia = p.vec_id
         |  WHERE pr.ib IN (${selUnion(r - 1)})
         |    AND p.vec_id NOT IN (${selUnion(r - 1)})
         |  GROUP BY p.vec_id, p.cosq
         |  ORDER BY score DESC, p.vec_id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |         sqrt(list_dot_product(embedding::DOUBLE[],
       |                               embedding::DOUBLE[])) AS nrm
       |  FROM embeddings
       |), q AS (
       |  SELECT v AS qv, nrm AS qn FROM e WHERE vec_id = 0
       |), pool AS MATERIALIZED (
       |  SELECT e.vec_id, e.v, e.nrm,
       |         list_dot_product(q.qv, e.v) / (q.qn * e.nrm) AS cosq
       |  FROM e, q WHERE e.vec_id != 0
       |  ORDER BY cosq DESC, e.vec_id LIMIT $poolN
       |), pairs AS MATERIALIZED (
       |  SELECT a.vec_id AS ia, b.vec_id AS ib,
       |         list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS c
       |  FROM pool a JOIN pool b ON a.vec_id != b.vec_id
       |), s1 AS MATERIALIZED (
       |  SELECT vec_id, 1 AS rank, $lamS * cosq AS score
       |  FROM pool ORDER BY cosq DESC, vec_id LIMIT 1),
       |$rounds
       |SELECT CAST(rank AS BIGINT) AS rank, vec_id,
       |       (score) AS mmr_score
       |FROM (${(1 to k).map(i => s"SELECT * FROM s$i")
            .mkString(" UNION ALL ")})""".stripMargin
  }

  /** V (extension) — pseudo-relevance-feedback query expansion
    * (Rocchio): search once, average the top-`nFb` hits into an
    * expanded query centroid, search again — the classic recall lift
    * when the original query vector under-specifies the intent. The
    * centroid must be ENGINE-EXACT despite being a float average:
    * elements are micro-quantized to BIGINT before the per-dimension
    * sum (integer sums are order-free; a raw double sum would be
    * partition-order-sensitive), and the centroid element is the one
    * exact double `Σmicro / (nFb·10⁶)` — both engines reconstitute
    * the SAME array (dimension-sorted aggregation) and run the same
    * sequential dot product over it. Output: the expanded top-`k`
    * with each hit flagged `was_seed` (already in the feedback set) —
    * the delta rows are what expansion bought. Two distributed scans
    * (original + expanded search); the centroid build is
    * feedback-sized. */
  def prfExpand(spark: SparkSession, dir: String, nFb: Int = 5,
      k: Int = 10): DataFrame = {
    VectorOps.register(spark)
    val emb = withVec(graft.Tables.load(spark, dir, "embeddings"))
    val q = emb.filter(col("vec_id") === 0)
      .select(col("v").as("qv"), col("norm").as("qn"))
    val seeds = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .withColumn("cosq",
        expr("dot_product(qv, v)") / (col("qn") * col("norm")))
      .select(col("vec_id"), col("v"))
      .orderBy(col("cosq").desc, col("vec_id")).limit(nFb)
    val centroid = seeds
      .select(posexplode(col("v")).as(Seq("d", "x")))
      .withColumn("xm", expr("CAST(round(x * 1000000) AS BIGINT)"))
      .groupBy("d").agg(sum(col("xm")).as("sm"))
      .select(col("d"),
        expr(s"CAST(sm AS DOUBLE) / (${nFb}.0 * 1000000.0)").as("c"))
      .agg(expr("transform(array_sort(collect_list(struct(d, c))), " +
        "s -> s.c)").as("cv"))
      .withColumn("cn", sqrt(expr("dot_product(cv, cv)")))
    val seedIds = seeds.select(col("vec_id").as("seed_id"))
    val expanded = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(centroid))
      .withColumn("cos_exp",
        expr("dot_product(cv, v)") / (col("cn") * col("norm")))
      .orderBy(col("cos_exp").desc, col("vec_id")).limit(k)
    expanded
      .join(seedIds, col("vec_id") === col("seed_id"), "left_outer")
      .select(col("vec_id"), (col("cos_exp")).as("cos_expanded"),
        col("seed_id").isNotNull.as("was_seed"))
  }

  /** Oracle for [[prfExpand]] — identical micro-quantized centroid,
    * dimension-ordered list rebuild, and sequential dot products. */
  def prfExpandSql(nFb: Int = 5, k: Int = 10, dim: Int = 64): String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |         sqrt(list_dot_product(embedding::DOUBLE[],
       |                               embedding::DOUBLE[])) AS nrm
       |  FROM embeddings
       |), q AS (
       |  SELECT v AS qv, nrm AS qn FROM e WHERE vec_id = 0
       |), seeds AS MATERIALIZED (
       |  SELECT e.vec_id, e.v,
       |         list_dot_product(q.qv, e.v) / (q.qn * e.nrm) AS cosq
       |  FROM e, q WHERE e.vec_id != 0
       |  ORDER BY cosq DESC, e.vec_id LIMIT $nFb
       |), cent AS MATERIALIZED (
       |  SELECT list(c ORDER BY d) AS cv
       |  FROM (
       |    SELECT d, CAST(sm AS DOUBLE) / (${nFb}.0 * 1000000.0) AS c
       |    FROM (
       |      SELECT u.i AS d,
       |             CAST(sum(CAST(round(v[u.i] * 1000000) AS BIGINT))
       |               AS BIGINT) AS sm
       |      FROM seeds, (SELECT unnest(generate_series(1, $dim)) AS i) u
       |      GROUP BY 1))
       |), cn AS (
       |  SELECT cv, sqrt(list_dot_product(cv, cv)) AS cn FROM cent
       |)
       |SELECT x.vec_id, (x.cos_exp) AS cos_expanded,
       |       x.vec_id IN (SELECT vec_id FROM seeds) AS was_seed
       |FROM (
       |  SELECT e.vec_id,
       |         list_dot_product(cn.cv, e.v) / (cn.cn * e.nrm) AS cos_exp
       |  FROM e, cn WHERE e.vec_id != 0
       |  ORDER BY cos_exp DESC, e.vec_id LIMIT $k
       |) x""".stripMargin

  /** V (extension) — exact integer ROC-AUC of a centroid-similarity
    * classifier: how well does "cosine to the label-0 centroid"
    * separate label 0 from the rest? The embedding-quality metric
    * behind "are these labels even linearly separable in this space" —
    * reported as the Mann-Whitney rank-sum AUC, computed ENTIRELY in
    * integers: the centroid is the [[prfExpand]] micro-quantized
    * order-free mean, per-vector scores micro-quantize through one
    * floor, ranks are `row_number` over the deterministic
    * (score, vec_id) order (ties broken by id — documented, exact,
    * engine-identical; no fractional average-ranks), and
    * `AUC = (ΣR₊ − n₊(n₊+1)/2) / (n₊·n₋)` emits in exact ppm. The
    * rank is one global sort over the CARDINALITY of the embedding
    * table (vectors, not tokens — the q26 aggregate-first precedent);
    * everything else is map-side. */
  def centroidAuc(spark: SparkSession, dir: String,
      posLabel: Int = 0): DataFrame = {
    VectorOps.register(spark)
    val emb = withVec(graft.Tables.load(spark, dir, "embeddings"))
    val centroid = emb.filter(col("label") === posLabel)
      .select(posexplode(col("v")).as(Seq("d", "x")))
      .withColumn("xm", expr("CAST(round(x * 1000000) AS BIGINT)"))
      .groupBy("d").agg(sum(col("xm")).as("sm"), count(lit(1)).as("n"))
      .agg(expr("transform(array_sort(collect_list(struct(d, " +
        "CAST(sm AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0D) AS c))), " +
        "s -> s.c)").as("cv"))
      .withColumn("cn", sqrt(expr("dot_product(cv, cv)")))
    val scored = emb.crossJoin(broadcast(centroid))
      .withColumn("s6", expr(
        "CAST(floor(dot_product(cv, v) / (cn * norm) * 1000000.0D + 0.5D) " +
          "AS BIGINT)"))
      .withColumn("pos", (col("label") === posLabel).cast("long"))
    val byScore = Window.orderBy(col("s6"), col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(byScore).cast("long"))
      .agg(sum(col("pos")).as("n_pos"),
        sum(lit(1L) - col("pos")).as("n_neg"),
        sum(col("pos") * col("rnk")).as("rank_sum"))
      // degenerate label split (empty positive or negative class) is a
      // div-by-zero below AND an empty/NaN centroid above — fail LOUDLY
      // and identically in both engines (ADVICE r13), never a silent
      // NULL-vs-raise divergence
      .filter(expr(
        "assert_true(n_pos > 0 AND n_neg > 0, " +
          "'centroid_auc: degenerate label split — both classes must " +
          "be non-empty') IS NULL"))
      .withColumn("auc_ppm", expr(
        "((rank_sum - (n_pos * (n_pos + 1)) div 2) * 1000000) " +
          "div (n_pos * n_neg)"))
  }

  /** Oracle for [[centroidAuc]] — identical micro-quantized centroid,
    * floored scores, (score, vec_id) ranks, and rank-sum algebra. */
  def centroidAucSql(posLabel: Int = 0, dim: Int = 64): String =
    s"""WITH e AS (
       |  SELECT vec_id, label, embedding::DOUBLE[] AS v,
       |         sqrt(list_dot_product(embedding::DOUBLE[],
       |                               embedding::DOUBLE[])) AS nrm
       |  FROM embeddings
       |), cent AS (
       |  SELECT list(c ORDER BY d) AS cv
       |  FROM (
       |    SELECT d, CAST(sm AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)
       |             AS c
       |    FROM (
       |      SELECT u.i AS d,
       |             CAST(sum(CAST(round(v[u.i] * 1000000) AS BIGINT))
       |               AS BIGINT) AS sm,
       |             count(*) AS n
       |      FROM e, (SELECT unnest(generate_series(1, $dim)) AS i) u
       |      WHERE e.label = $posLabel
       |      GROUP BY 1))
       |), cn AS (
       |  SELECT cv, sqrt(list_dot_product(cv, cv)) AS cn FROM cent
       |), sc AS (
       |  SELECT e.vec_id,
       |         CAST(floor(list_dot_product(cn.cv, e.v) / (cn.cn * e.nrm)
       |           * 1000000.0 + 0.5) AS BIGINT) AS s6,
       |         CASE WHEN e.label = $posLabel THEN 1 ELSE 0 END AS pos
       |  FROM e, cn
       |), rk AS (
       |  SELECT pos,
       |         CAST(row_number() OVER (ORDER BY s6, vec_id) AS BIGINT)
       |           AS rnk
       |  FROM sc
       |)
       |, agg AS (
       |  SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
       |         CAST(sum(1 - pos) AS BIGINT) AS n_neg,
       |         CAST(sum(pos * rnk) AS BIGINT) AS rank_sum
       |  FROM rk
       |)
       |SELECT n_pos, n_neg, rank_sum,
       |       CASE WHEN n_pos = 0 OR n_neg = 0
       |            THEN CAST(error('centroid_auc: degenerate label split'
       |                 ) AS BIGINT)
       |            ELSE ((rank_sum - (n_pos * (n_pos + 1)) // 2) * 1000000)
       |                 // (n_pos * n_neg) END AS auc_ppm
       |FROM agg""".stripMargin

  /** V (extension) — SECOND principal component via Hotelling
    * deflation: power-iterate for the top PC, project it out of every
    * vector (`v' = v − (v·u₁)u₁`), iterate again on the deflated
    * corpus. The variance split across the top two axes is the "is
    * this embedding space really D-dimensional or secretly a plane"
    * QC that one component can't answer.
    *
    * EXACT-INTEGER fixed-point iteration (the r12 float-chained form
    * flaked its cross-engine hash; this is the
    * [[graft.ops.EventAnalytics.markovStationary]] discipline applied
    * to a dense matvec): vectors are micro-quantized to BIGINT ONCE
    * (`vq = floor(v·10⁶ + ½)` — identical single float ops on
    * bit-identical parquet doubles), the iterate lives as a ppm
    * BIGINT vector, and every product/sum/`div` downstream is integer
    * arithmetic — order-free and bit-equal by construction on both
    * engines (Spark `div` and DuckDB `//` both truncate toward zero;
    * verified). The deflated product needs no materialized v′:
    * `(v′·w) = (v·w) − s₁·(u₁·w)` with every factor an integer dot at
    * a documented scale, `div`-reduced before each multiply so no
    * intermediate exceeds ~10¹⁶ (unit-norm input ⇒ dots ≤ ~1.2·10¹²
    * at the 10¹² scale; sums over rows ≤ n·4·10⁹ — BIGINT-safe past
    * 10⁹ rows). Per round the only non-integer ops are one
    * BIGINT→DOUBLE cast, one `sqrt`, one divide, one `floor(·+½)` —
    * each a single correctly-rounded IEEE op on bit-equal inputs, so
    * cross-engine determinism holds without any float-fold order
    * argument. Driver-free: the iteration state is a ONE-ROW
    * (warr, nrm7) DataFrame, localCheckpoint'ed per round so the
    * 2·iters corpus scans stay flat (no nested re-evaluation);
    * broadcast into each scan. Output: per-dim PC2 loadings (ppm →
    * exact double), λ₂, and the u₁·u₂ orthogonality witness (exact
    * 10¹²-scale integer dot). */
  def pcaDeflate(spark: SparkSession, dir: String, iters: Int = 3)
      : DataFrame = {
    val embq = graft.Tables.load(spark, dir, "embeddings")
      .select(expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
        "x -> CAST(floor(x * 1000000.0D + 0.5D) AS BIGINT))").as("vq"))
    // Re-normalize a 64-row (d, t, n) reduction into the 1-row ppm
    // state: ta7 = (t div n) div 100 (scale 1e7), nrm7 = √Σta7²
    // (Σta7² ≤ 64·(4e7)² ≈ 10¹⁷ — BIGINT-exact), next ppm iterate =
    // floor(ta7·10⁶/nrm7 + ½).
    def renorm(red: DataFrame): DataFrame = red
      .withColumn("ta7", expr("(t div n) div 100"))
      .agg(expr("transform(array_sort(collect_list(struct(d, ta7))), " +
        "s -> s.ta7)").as("ta"))
      .withColumn("nrm7", sqrt(expr(
        "CAST(aggregate(transform(ta, x -> x * x), 0L, " +
          "(acc, x) -> acc + x) AS DOUBLE)")))
      .select(expr("transform(ta, x -> CAST(floor(CAST(x AS DOUBLE) * " +
        "1000000.0D / nrm7 + 0.5D) AS BIGINT))").as("warr"), col("nrm7"))
      .localCheckpoint()
    val idot = "aggregate(zip_with(%s, %s, (a, b) -> a * b), 0L, " +
      "(acc, x) -> acc + x)"
    val seed = spark.range(1).select(
      expr("transform(sequence(1, 64), i -> CAST(125000 AS BIGINT))")
        .as("warr"), lit(0.0).as("nrm7"))
    // Phase 1 — plain power rounds for u₁: s6 = (vq·warr) div 1e6
    // (scale 1e6), per-dim contribution (vq[d]·s6) div 1e3 (scale 1e9).
    var u1 = seed
    for (_ <- 1 to iters) {
      u1 = renorm(embq.crossJoin(broadcast(u1))
        .withColumn("s6", expr(s"${idot.format("vq", "warr")} div 1000000"))
        .select(col("s6"), posexplode(col("vq")).as(Seq("d", "x")))
        .withColumn("c9", expr("(x * s6) div 1000"))
        .groupBy("d").agg(sum(col("c9")).as("t"), count(lit(1)).as("n")))
    }
    val u1st = u1.select(col("warr").as("u1arr"))
    // Phase 2 — deflated rounds: s₁ at scale 1e9, u₁·w at scale 1e6
    // (both div-reduced from the 1e12 integer dots), deflated scalar
    // s6 = (vq·w − (s₁·uw) reduced) div 1e6, deflated component
    // xq = vq[d] − (s₁·u1q[d]) div 1e9 (scale 1e6).
    var u2 = seed
    for (_ <- 1 to iters) {
      val st = u2.crossJoin(u1st)
        .withColumn("uw6", expr(s"${idot.format("u1arr", "warr")} div 1000000"))
      u2 = renorm(embq.crossJoin(broadcast(st))
        .withColumn("s19", expr(s"${idot.format("vq", "u1arr")} div 1000"))
        .withColumn("s6", expr(s"(${idot.format("vq", "warr")} - " +
          "(s19 * uw6) div 1000) div 1000000"))
        .select(col("s19"), col("s6"), col("u1arr"),
          posexplode(col("vq")).as(Seq("d", "x")))
        .withColumn("xq",
          expr("x - (s19 * element_at(u1arr, d + 1)) div 1000000000"))
        .withColumn("c9", expr("(xq * s6) div 1000"))
        .groupBy("d").agg(sum(col("c9")).as("t"), count(lit(1)).as("n")))
    }
    u2.crossJoin(u1st)
      .withColumn("oq", expr(s"${idot.format("u1arr", "warr")}"))
      .select(col("nrm7"), col("oq"),
        posexplode(col("warr")).as(Seq("dim", "u2q")))
      .select(col("dim"),
        expr("CAST(u2q AS DOUBLE) / 1000000.0D").as("loading2"),
        (col("nrm7") / lit(1e7)).as("lambda2"),
        (expr("CAST(oq AS DOUBLE) / 1000000000000.0D")).as("ortho"))
  }

  /** Oracle for [[pcaDeflate]] — the identical exact-integer
    * fixed-point rounds unrolled as chained MATERIALIZED CTEs. Every
    * distributed quantity is a BIGINT product/sum/`//` (DuckDB `//`
    * truncates toward zero exactly like Spark `div`); the only float
    * ops per round are the same single cast/sqrt/divide/floor the
    * Spark side performs on bit-equal integer inputs. */
  def pcaDeflateSql(iters: Int = 3, dim: Int = 64): String = {
    def idot(a: String, b: String): String =
      s"CAST(list_sum(list_transform(generate_series(1, $dim), " +
        s"i -> $a[i] * $b[i])) AS BIGINT)"
    def renorm(name: String, red: String): String =
      s"""$name AS MATERIALIZED (
         |  SELECT list_transform(ta, x -> CAST(floor(CAST(x AS DOUBLE) *
         |           1000000.0 / nrm7 + 0.5) AS BIGINT)) AS warr, nrm7
         |  FROM (
         |    SELECT ta, sqrt(CAST(list_sum(list_transform(ta,
         |             x -> x * x)) AS DOUBLE)) AS nrm7
         |    FROM (SELECT list((t // n) // 100 ORDER BY d) AS ta
         |          FROM $red))
         |)""".stripMargin
    val u1rounds = (1 to iters).map { k =>
      val prev = if (k == 1) "w0" else s"w${k - 1}"
      s"""p${k}s AS MATERIALIZED (
         |  SELECT e.vq, ${idot("e.vq", "w.warr")} // 1000000 AS s6
         |  FROM e, $prev w
         |), p${k}t AS MATERIALIZED (
         |  SELECT u.i AS d, CAST(sum((s.vq[u.i] * s.s6) // 1000) AS BIGINT)
         |           AS t, count(*) AS n
         |  FROM p${k}s s, (SELECT unnest(generate_series(1, $dim)) AS i) u
         |  GROUP BY 1
         |),
         |${renorm(s"w$k", s"p${k}t")}""".stripMargin
    }.mkString(",\n")
    val u2rounds = (1 to iters).map { k =>
      val prev = if (k == 1) "w0" else s"dw${k - 1}"
      s"""d${k}s AS MATERIALIZED (
         |  SELECT e.vq,
         |         ${idot("e.vq", "uu.u1arr")} // 1000 AS s19,
         |         (${idot("e.vq", "w.warr")} -
         |           (s19 * ((${idot("uu.u1arr", "w.warr")}) // 1000000))
         |             // 1000) // 1000000 AS s6
         |  FROM e, $prev w, u1 uu
         |), d${k}t AS MATERIALIZED (
         |  SELECT u.i AS d,
         |         CAST(sum(((s.vq[u.i] -
         |             (s.s19 * uu.u1arr[u.i]) // 1000000000) * s.s6)
         |           // 1000) AS BIGINT) AS t,
         |         count(*) AS n
         |  FROM d${k}s s, u1 uu,
         |       (SELECT unnest(generate_series(1, $dim)) AS i) u
         |  GROUP BY 1
         |),
         |${renorm(s"dw$k", s"d${k}t")}""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT list_transform(embedding::DOUBLE[],
       |           x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS vq
       |  FROM embeddings
       |), w0 AS (
       |  SELECT list_transform(generate_series(1, $dim),
       |           i -> 125000::BIGINT) AS warr
       |),
       |$u1rounds,
       |u1 AS MATERIALIZED (SELECT warr AS u1arr FROM w$iters),
       |$u2rounds
       |SELECT u.i - 1 AS dim,
       |       CAST(dw.warr[u.i] AS DOUBLE) / 1000000.0 AS loading2,
       |       (dw.nrm7 / 10000000.0) AS lambda2,
       |       (CAST(${idot("uu.u1arr", "dw.warr")} AS DOUBLE)
       |             / 1000000000000.0) AS ortho
       |FROM dw$iters dw, u1 uu,
       |     (SELECT unnest(generate_series(1, $dim)) AS i) u"""
      .stripMargin
  }
}
