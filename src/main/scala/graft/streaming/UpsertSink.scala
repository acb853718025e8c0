package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Idempotent keyed upsert sink over parquet — the Spark-native replacement
  * for the reference's Cassandra PK-overwrite tables (K1 `user_details`,
  * K2 `sales`, K3 `latest_location`; reference
  * `IOTSparkStreaming.scala:68-69,76,166`), designed for `foreachBatch`.
  *
  * No ACID MERGE is available in this env (no Delta), so each batch writes a
  * fresh snapshot version and atomically repoints a `_latest` marker
  * (SURVEY.md §7.4.1 "snapshot swap"):
  *
  *  - **Last-write-wins by version, not by arrival**: the caller names a set
  *    of ordering columns; the surviving row per key is the max by that
  *    ordering across the existing snapshot and the incoming batch. This
  *    makes the result independent of micro-batch boundaries AND of replay —
  *    reprocessing a batch after checkpoint recovery converges to the same
  *    snapshot (the reference is only at-least-once, SURVEY.md §2.7; this is
  *    effectively exactly-once).
  *  - **Batch markers** (`_batch_<id>` files) short-circuit replayed batches
  *    so recovery does no duplicate work.
  *
  * Scale: the merge is one window shuffle over (snapshot ∪ batch) keyed by
  * the upsert key — the snapshot holds one row per key, so the shuffle is
  * O(keys + batch), the minimal cost of any keyed register. On a real
  * cluster the same code runs with the snapshot bucketed by key.
  */
final class UpsertSink(path: String, keyCols: Seq[String], orderCols: Seq[String]) {
  private val root = Paths.get(path)
  Files.createDirectories(root)

  private def latestPtr = root.resolve("_latest")

  private def currentVersion: Option[String] =
    if (Files.exists(latestPtr)) Some(Files.readString(latestPtr).trim) else None

  def alreadyApplied(batchId: Long): Boolean =
    Files.exists(root.resolve(s"_batch_$batchId"))

  /** Read the current snapshot, or None before the first batch. */
  def snapshot(spark: SparkSession): Option[DataFrame] =
    currentVersion.map(v => spark.read.parquet(root.resolve(v).toString))

  /** Merge one micro-batch: dedupe to max-by-ordering per key across
    * (snapshot ∪ batch), write snapshot v<batchId>, atomically swap. */
  def upsert(batch: DataFrame, batchId: Long): Unit = {
    if (alreadyApplied(batchId)) return
    if (currentVersion.contains(s"v$batchId")) {
      // Crash landed between the pointer swap and the marker write: the
      // batch's snapshot is already live. Re-merging would overwrite the
      // very directory the merge plan reads (wedging recovery forever) —
      // just complete the interrupted commit.
      Files.writeString(root.resolve(s"_batch_$batchId"), "")
      return
    }
    val spark = batch.sparkSession
    val merged = snapshot(spark) match {
      case Some(prev) => prev.unionByName(batch)
      case None => batch
    }
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc): _*)
    val next = merged
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
    val prevVersion = currentVersion
    val version = s"v$batchId"
    next.write.mode("overwrite").parquet(root.resolve(version).toString)
    val tmp = root.resolve(s"_latest.tmp.$batchId")
    Files.writeString(tmp, version)
    Files.move(tmp, latestPtr, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    Files.writeString(root.resolve(s"_batch_$batchId"), "")
    // GC superseded snapshots (keep the previous one as a recovery fallback;
    // older ones are unreachable once the pointer moved past them).
    versionsOnDisk.filterNot(v => v == version || prevVersion.contains(v))
      .foreach(deleteRecursively)
  }

  private def versionsOnDisk: Seq[String] = {
    import scala.jdk.CollectionConverters._
    val s = Files.list(root)
    try s.iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("v")).toSeq
    finally s.close()
  }

  private def deleteRecursively(name: String): Unit = {
    import scala.jdk.CollectionConverters._
    val dir = root.resolve(name)
    if (Files.exists(dir)) {
      val s = Files.walk(dir)
      try s.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
      finally s.close()
    }
  }
}
