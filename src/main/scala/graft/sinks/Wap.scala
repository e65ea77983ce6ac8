package graft.sinks

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write–Audit–Publish (extension) — the transactional publishing
  * pattern every production table write should follow: write the batch
  * to an UNREFERENCED staging location, audit it there (row count, key
  * nullability, key uniqueness), and only then atomically repoint the
  * "current" pointer at it. Readers always follow the pointer, so they
  * see either the old version or the fully-audited new one — never a
  * half-written or invalid table, which a direct overwrite exposes the
  * moment the first task commits.
  *
  * The pointer is a single tiny file moved into place with an ATOMIC
  * rename — the local stand-in for the metastore/catalog transaction a
  * real lakehouse commits (same contract as the
  * [[Upsert]] store's version manifest). A failed audit leaves the
  * pointer untouched: the bad batch stays on disk for inspection, and
  * [[read]] keeps serving the last published version.
  */
object Wap {

  /** Outcome of a publish attempt. */
  final case class PublishResult(version: Long, published: Boolean,
      reason: String)

  private def pointerPath(root: String) = Paths.get(root, "CURRENT")

  /** Audit rules: non-empty, no NULL keys, keys unique. Runs ON the
    * staged files (one scan) — auditing the in-memory DataFrame would
    * validate the plan, not what landed on disk. */
  private def audit(spark: SparkSession, stagingDir: String,
      keyCol: String): Option[String] = {
    val staged = spark.read.parquet(stagingDir)
    if (!staged.columns.contains(keyCol))
      return Some(s"key column $keyCol missing")
    val checks = staged.agg(
      count(lit(1)).as("n"),
      count(when(col(keyCol).isNull, 1)).as("n_null"),
      countDistinct(col(keyCol)).as("n_keys")).head()
    val (n, nNull, nKeys) =
      (checks.getLong(0), checks.getLong(1), checks.getLong(2))
    if (n == 0L) Some("empty batch")
    else if (nNull > 0L) Some(s"$nNull NULL keys")
    else if (nKeys != n) Some(s"${n - nKeys} duplicate keys")
    else None
  }

  /** Write `df` to a fresh staging dir under `root`, audit it, and
    * publish by atomic pointer swap if the audit passes. */
  def publish(spark: SparkSession, df: DataFrame, root: String,
      keyCol: String = "event_id"): PublishResult = {
    Files.createDirectories(Paths.get(root))
    val version = System.nanoTime()
    val staging = s"$root/staging_v$version"
    df.write.mode("errorifexists").parquet(staging)
    audit(spark, staging, keyCol) match {
      case Some(reason) => PublishResult(version, published = false, reason)
      case None =>
        val tmp = Paths.get(root, s".CURRENT_v$version")
        Files.write(tmp, staging.getBytes(StandardCharsets.UTF_8))
        Files.move(tmp, pointerPath(root),
          StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        PublishResult(version, published = true, "ok")
    }
  }

  /** Read the current published version (pointer-follow). Throws if
    * nothing was ever published — an unpublished table is an error, not
    * an empty one. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val p = pointerPath(root)
    require(Files.exists(p), s"no published version under $root")
    val target = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    spark.read.parquet(target)
  }

  /** Registered-query form: publish the trade batch, then attempt a
    * CORRUPT second publish (NULL keys) that must fail its audit, and
    * read back through the pointer — the result proves the pointer
    * still serves the audited version. */
  def roundTrip(spark: SparkSession, trades: DataFrame): DataFrame = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_wap_" +
      spark.sparkContext.applicationId
    val r1 = publish(spark, trades, root)
    require(r1.published, s"valid batch failed audit: ${r1.reason}")
    val corrupt = trades.withColumn("event_id",
      when(col("event_id") % 5 === 0, lit(null)).otherwise(col("event_id")))
    val r2 = publish(spark, corrupt, root)
    require(!r2.published, "corrupt batch passed audit")
    read(spark, root)
      .select("event_id", "symbol", "timestamp", "price", "volume")
  }

  /** Oracle for [[roundTrip]] (body only — caller prepends the trades
    * CTE): the audited first version, i.e. the identity. */
  val roundTripSql: String =
    """SELECT event_id, symbol, "timestamp", price, volume FROM trades"""
}
