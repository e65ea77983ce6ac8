package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §7.5): media payloads as opaque
  * `binary` columns with typed metadata, decoded per-partition.
  *
  * The image/audio codec libraries are not in this container, so the
  * decode step is a clearly-marked deterministic STUB — but the
  * Spark-side plumbing is real and at the shape a 100-TB media pipeline
  * needs: binary column + metadata, `mapPartitions` batch decode (one
  * decoder instance per partition, not per row — the Scala equivalent
  * of `mapInPandas` batching), explicit output schema.
  */
object Multimodal {

  /** Metadata extraction over the binary payload with pure expressions
    * (codegen'd, no decode needed): byte length, content digest, fake
    * container geometry derived from the length. */
  def binaryMeta(docs: DataFrame): DataFrame =
    docs
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .select(
        col("doc_id"),
        length(col("payload")).as("byte_len"),
        sha2(col("payload"), 256).as("sha256"),
        (lit(64) + length(col("payload")) % 64).as("width"),
        (lit(64) + (length(col("payload")) * 7) % 64).as("height"),
        expr("CAST(length(payload) div 256 AS INT) + 1").as("n_frames"))

  /** One decoded "frame summary" row per document. */
  case class DecodedMedia(
      doc_id: Long,
      byte_len: Int,
      content_hash: String,
      first_byte: Int,
      last_byte: Int,
      mean_edge: Double)

  /** STUB decoder: stands in for an image/audio codec. Deterministic —
    * digest + first/last byte of the payload — so it is oracle-checkable,
    * but structured like the real thing: instantiated once per
    * partition, fed batches of raw bytes.
    */
  private def decodeStub(payload: Array[Byte]): (String, Int, Int, Double) = {
    // ??? <- real codec goes here; MessageDigest models its per-record cost
    val md = java.security.MessageDigest.getInstance("MD5")
    val hash = md.digest(payload).map("%02x".format(_)).mkString
    // Empty payload: -1 edges, matching the DuckDB oracle's
    // ord(substr('', 1, 1)) = -1 (no crash on zero-length documents).
    val first = if (payload.isEmpty) -1 else payload(0) & 0xff
    val last = if (payload.isEmpty) -1 else payload(payload.length - 1) & 0xff
    (hash, first, last, (first + last) / 2.0)
  }

  /** Frame sampling: every `stride`-th frame of each container becomes
    * its own row (`sequence` + `explode` — distributed, no driver loop),
    * with a deterministic per-frame fingerprint standing in for decoded
    * frame bytes. This is the fan-out shape of video/audio sampling at
    * scale: rows stay with their partition, downstream ops see
    * (doc_id, frame_idx) granularity. */
  def frameSample(docs: DataFrame, stride: Int = 4): DataFrame =
    binaryMeta(docs)
      .select(col("doc_id"), col("sha256"),
        explode(expr(s"sequence(0, n_frames - 1, $stride)")).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        md5(concat_ws("-", col("sha256"), col("frame_idx"))).as("frame_fp"))

  /** Resize stub: deterministic 4:1 "downsample" (every 4th character
    * of the payload — stands in for an image resample kernel). Emits
    * size-before/after and a digest of the resized payload rather than
    * the payload itself, the usual shape when the full-size column
    * stays in object storage. */
  def resizeStub(docs: DataFrame, stride: Int = 4): DataFrame =
    docs
      .select(col("doc_id"), length(col("text")).as("orig_len"),
        expr(s"concat_ws('', transform(sequence(1, length(text), $stride), " +
          "i -> substring(text, i, 1)))").as("resized"))
      .select(col("doc_id"), col("orig_len"),
        length(col("resized")).as("resized_len"),
        md5(col("resized")).as("resized_md5"))

  case class BatchFeature(
      doc_id: Long,
      byte_len: Int,
      vowel_ratio: Double,
      content_hash: String)

  /** BATCHED per-partition feature extraction — the Scala analog of
    * `mapInPandas`: the partition iterator is drained in fixed-size
    * batches (the shape a vectorized model / codec API wants — one
    * inference call per batch, init amortized per partition), then
    * features are re-emitted per row. Per-row outputs are independent
    * of batch boundaries BY CONSTRUCTION, so repartitioning can never
    * change results — the invariant any batched extractor must keep. */
  def extractBatched(spark: SparkSession, docs: DataFrame,
      batchSize: Int = 64): Dataset[BatchFeature] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // one vectorized "model call" per batch of documents
          batch.map { case (id, text) =>
            var vowels = 0
            var i = 0
            while (i < text.length) {
              if ("aeiou".indexOf(Character.toLowerCase(text.charAt(i))) >= 0)
                vowels += 1
              i += 1
            }
            // UNROUNDED quotient of exact ints: one correctly-rounded
            // IEEE division, bit-identical to DuckDB's — the former
            // setScale(6, HALF_UP) carried the round-tie hazard class
            // (exact-expansion HALF_UP vs DuckDB's binary rounding
            // split w5_ewma on half-µ ties; r14 audit)
            val ratio =
              if (text.isEmpty) 0.0
              else vowels.toDouble / text.length
            val md = java.security.MessageDigest.getInstance("MD5")
            val hash = md.digest(text.getBytes("UTF-8"))
              .map("%02x".format(_)).mkString
            BatchFeature(id, text.getBytes("UTF-8").length, ratio, hash)
          }
        }
      }
  }

  /** Per-partition batch decode: binary in, typed rows out. */
  def decodeMedia(spark: SparkSession, docs: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    docs
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // one "decoder" per partition (the expensive init lives here)
        rows.map { case (id, payload) =>
          val (hash, first, last, mean) = decodeStub(payload)
          DecodedMedia(id, payload.length, hash, first, last, mean)
        }
      }
  }

  /** Batch-inference sharding (extension) — pack media payloads into
    * byte-budgeted shards per modality, the partitioning step before a
    * GPU decode/embed fan-out (each shard ≈ one inference batch; a
    * count-based split would put 100 thumbnails or 3 videos in the same
    * batch). Shard id is start-offset binning over the per-modality
    * running byte total: shard = (cum − len) div budget.
    *
    * The running total does NOT use a per-modality window — with 3
    * modalities that is 3 tasks sorting the corpus. Same prefix-sum
    * decomposition as [[graft.ops.TradeOps.orderedSplit]]: coarse
    * doc_id blocks → per-block byte sums → tiny offsets window
    * (#blocks rows) broadcast back → within-block running sum. Holds
    * at any corpus size. */
  def modalityShard(docs: DataFrame, budgetBytes: Long = 8192,
      blockSize: Long = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = docs
      .withColumn("b", length(encode(col("text"), "UTF-8")).cast("long"))
      .withColumn("modality",
        when(col("b") % 3 === 0, lit("image"))
          .when(col("b") % 3 === 1, lit("audio"))
          .otherwise(lit("video")))
      .withColumn("_blk", expr(s"doc_id div $blockSize"))
    val blocks = m.groupBy("modality", "_blk").agg(sum(col("b")).as("_n"))
    val prior = Window.partitionBy("modality").orderBy("_blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = blocks.select(col("modality"), col("_blk"),
      coalesce(sum(col("_n")).over(prior), lit(0L)).as("_prior"))
    val inBlk = Window.partitionBy("modality", "_blk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    m.join(broadcast(offsets), Seq("modality", "_blk"))
      .withColumn("cum", col("_prior") + sum(col("b")).over(inBlk))
      .withColumn("shard",
        ((col("cum") - col("b")) - pmod(col("cum") - col("b"), lit(budgetBytes)))
          / budgetBytes)
      .groupBy(col("modality"), col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("b")).as("shard_bytes"))
  }

  /** Oracle for [[modalityShard]] — the plain per-modality running-sum
    * window the Spark side decomposes. */
  def modalityShardSql(budgetBytes: Long = 8192): String =
    s"""WITH m AS (
       |  SELECT doc_id, octet_length(encode(text)) AS b,
       |         CASE octet_length(encode(text)) % 3
       |           WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       |           ELSE 'video' END AS modality
       |  FROM documents
       |), c AS (
       |  SELECT modality, doc_id, b,
       |         sum(b) OVER (PARTITION BY modality ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM m
       |)
       |SELECT modality, CAST((cum - b) // $budgetBytes AS BIGINT) AS shard,
       |       count(*) AS n_docs, CAST(sum(b) AS BIGINT) AS shard_bytes
       |FROM c GROUP BY 1, 2""".stripMargin

  /** Exact media dedup by content digest, per modality — the FIRST
    * pass every multimodal ingest runs (identical images arrive via
    * thousands of URLs; hashing the payload is cheap, decoding it is
    * not, so dedup precedes decode). Digest-group once on sha256, then
    * roll up per modality: payload count, distinct count, and the two
    * numbers that price the decode stage — redundant payloads and
    * redundant BYTES `Σ(copies−1)·len` (exact BIGINTs; identical sha ⇒
    * identical length, so per-group arithmetic is well-defined). The
    * shuffle is digest-keyed (uniform by construction — a content hash
    * can't skew), the rollup is |modalities|-sized. */
  def payloadDedup(docs: DataFrame): DataFrame =
    docs
      .withColumn("b", length(encode(col("text"), "UTF-8")).cast("long"))
      .withColumn("modality",
        when(col("b") % 3 === 0, lit("image"))
          .when(col("b") % 3 === 1, lit("audio"))
          .otherwise(lit("video")))
      .withColumn("sha", sha2(encode(col("text"), "UTF-8"), 256))
      .groupBy("modality", "sha")
      .agg(count(lit(1)).as("copies"), max(col("b")).as("len"))
      .groupBy("modality")
      .agg(sum(col("copies")).as("n_payloads"),
        count(lit(1)).as("n_distinct"),
        sum(col("copies") - 1).as("n_redundant"),
        sum((col("copies") - 1) * col("len")).as("bytes_redundant"))
      .withColumn("dup_ppm",
        expr("(n_redundant * 1000000) div n_payloads"))

  /** Oracle for [[payloadDedup]]. */
  val payloadDedupSql: String =
    """WITH p AS (
      |  SELECT CAST(octet_length(encode(text)) AS BIGINT) AS b,
      |         CASE WHEN octet_length(encode(text)) % 3 = 0 THEN 'image'
      |              WHEN octet_length(encode(text)) % 3 = 1 THEN 'audio'
      |              ELSE 'video' END AS modality,
      |         sha256(text) AS sha
      |  FROM documents
      |), g AS (
      |  SELECT modality, sha, count(*) AS copies, max(b) AS len
      |  FROM p GROUP BY 1, 2
      |)
      |SELECT modality,
      |       CAST(sum(copies) AS BIGINT) AS n_payloads,
      |       count(*) AS n_distinct,
      |       CAST(sum(copies - 1) AS BIGINT) AS n_redundant,
      |       CAST(sum((copies - 1) * len) AS BIGINT) AS bytes_redundant,
      |       (CAST(sum(copies - 1) AS BIGINT) * 1000000)
      |         // CAST(sum(copies) AS BIGINT) AS dup_ppm
      |FROM g GROUP BY 1""".stripMargin
}
