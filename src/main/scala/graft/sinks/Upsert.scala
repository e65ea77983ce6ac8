package graft.sinks

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Idempotent merge-by-key sink (reference K1/K2/K7: Cassandra `append`
  * into a `(symbol, timestamp)` primary key ⇒ last-writer-wins upsert —
  * `ProcessStockStream.py:65-89`, `ddl.cql:2-25`).
  *
  * Offline there is no Cassandra connector, so the store is a versioned
  * parquet table: each micro-batch merges into version N+1 and flips a
  * pointer file. The merge itself is fully distributed (union + window
  * dedup, shuffle on the key); replaying a failed batch rewrites the same
  * target version — idempotent, matching the reference's
  * effectively-exactly-once contract (SURVEY.md §2.8 T12). A real
  * cluster sink (Cassandra / Delta MERGE / Iceberg upsert) drops into the
  * same `foreachBatch` seam.
  */
object Upsert {

  private def pointerPath(root: String) = Paths.get(root, "_CURRENT")

  def currentVersion(root: String): Option[Long] = {
    val p = pointerPath(root)
    val fromPointer =
      if (Files.exists(p)) new String(Files.readAllBytes(p)).trim.toLongOption
      else None
    // Fallback: a torn/empty pointer (crash before the atomic flip
    // landed) must not make the table unreadable — recover the highest
    // complete version from the v* directories.
    fromPointer.orElse {
      import scala.jdk.CollectionConverters._
      if (!Files.isDirectory(Paths.get(root))) None
      else Files.list(Paths.get(root)).iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("v") => s.drop(1).toLongOption }
        .flatten.maxOption
    }
  }

  /** Read the current state of the keyed table (empty schema-less
    * DataFrame if nothing has been written yet). */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    currentVersion(root).map(v => spark.read.parquet(s"$root/v$v"))

  /** Merge `batch` into the keyed table at `root`: rows with a key
    * already present overwrite it (new batch wins); others append. */
  def merge(batch: DataFrame, batchId: Long, root: String, keys: Seq[String]): Unit = {
    val spark = batch.sparkSession
    Files.createDirectories(Paths.get(root))
    val incoming = batch.withColumn("_gen", lit(batchId + 1))
    val merged = read(spark, root) match {
      case None => incoming
      case Some(existing) =>
        val w = Window.partitionBy(keys.map(col): _*).orderBy(col("_gen").desc)
        existing.unionByName(incoming)
          .withColumn("_rank", row_number().over(w))
          .filter(col("_rank") === 1)
          .drop("_rank")
    }
    val next = currentVersion(root).getOrElse(-1L) + 1
    merged.write.mode("overwrite").parquet(s"$root/v$next")
    // Atomic pointer flip: write-to-temp + ATOMIC_MOVE, so a crash
    // mid-write can never leave a truncated/empty pointer (readers see
    // either the old version or the new one, never garbage).
    val tmp = Paths.get(root, s"_CURRENT.tmp.$next")
    Files.write(tmp, next.toString.getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, pointerPath(root),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // GC: drop versions older than next-1. The previous version is kept
    // for readers that resolved the pointer just before the flip; a
    // replayed batch only ever rewrites `next`, never a GC'd dir.
    (0L until next - 1).foreach { v =>
      val dir = Paths.get(root, s"v$v")
      if (Files.exists(dir)) {
        import scala.jdk.CollectionConverters._
        Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(p => Files.deleteIfExists(p))
      }
    }
  }
}
