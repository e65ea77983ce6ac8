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
}
