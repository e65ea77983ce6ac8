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
      .select(col("q_id"), col("vec_id"), round(col("cos"), 6).as("cos_sim"),
        col("rnk"))
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
      .select(col("q_id"), col("vec_id"), round(col("cos"), 6).as("cos_sim"),
        col("rnk"))
  }
}
