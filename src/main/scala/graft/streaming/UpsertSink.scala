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
  * No ACID MERGE is available in this env (no Delta), so the register is a
  * HASH-BUCKETED snapshot plus an atomically-swapped manifest (the
  * Iceberg-manifest shape, SURVEY.md §7.4.1):
  *
  *  - The key space is hashed into `nBuckets` fixed buckets. Each micro-batch
  *    merges and rewrites ONLY the buckets its keys touch; untouched buckets'
  *    files are never read or rewritten — their manifest entries keep
  *    pointing at the version directory that last wrote them. Per-batch cost
  *    is therefore O(keys in touched buckets + batch), not O(total keys):
  *    the difference between a register that survives 100× key growth and
  *    one that rewrites the world every second.
  *  - `_latest` holds the bucket → version-directory manifest; a batch
  *    writes its buckets under a fresh `v<batchId>` directory and swaps the
  *    manifest atomically, so readers always see a complete, consistent
  *    snapshot.
  *  - **Last-write-wins by version, not by arrival**: the caller names a set
  *    of ordering columns; the surviving row per key is the max by that
  *    ordering across the bucket's snapshot and the incoming batch. The
  *    result is independent of micro-batch boundaries AND of replay —
  *    reprocessing a batch after checkpoint recovery converges to the same
  *    snapshot (the reference is only at-least-once, SURVEY.md §2.7; this is
  *    effectively exactly-once).
  *  - **Batch markers** (`_batch_<id>` files) short-circuit replayed batches
  *    so recovery does no duplicate work.
  *
  * Scale: the merge shuffles (touched buckets ∪ batch) once on the upsert
  * key; the touched-bucket set itself is metadata (≤ nBuckets ints). On a
  * real cluster `nBuckets` is sized so one bucket's keys fit an executor
  * comfortably (e.g. total keys / ~10M).
  */
final class UpsertSink(path: String, keyCols: Seq[String], orderCols: Seq[String],
                       nBuckets: Int = 16) extends TableSink {
  require(nBuckets > 0)
  private val root = Paths.get(path)
  Files.createDirectories(root)

  // nBuckets governs where persisted rows live: reopening an existing
  // register (the checkpoint-recovery path) with a different bucket count
  // would point bucketOf at the wrong buckets and leave stale duplicates of
  // a key alive in others — so the count is persisted on first open and
  // enforced on every reopen.
  locally {
    val metaPath = root.resolve("_meta")
    if (Files.exists(metaPath)) {
      val persisted = Files.readString(metaPath).trim.stripPrefix("nBuckets=").toInt
      require(persisted == nBuckets,
        s"register at $path was created with nBuckets=$persisted; reopening with " +
          s"nBuckets=$nBuckets would mis-bucket keys")
    } else Files.writeString(metaPath, s"nBuckets=$nBuckets\n")
  }

  /** Partition-column name for the bucket id; never collides with data
    * columns (and must not start with `_`/`.` — Spark's file listing hides
    * such directory names). */
  private val BucketCol = "graft_bucket"

  private def latestPtr = root.resolve("_latest")

  /** bucket → version-dir name (e.g. 3 → "v7"); empty before first batch. */
  private def currentManifest: Map[Int, String] =
    if (!Files.exists(latestPtr)) Map.empty
    else Files.readString(latestPtr).linesIterator.filter(_.nonEmpty).map { l =>
      val Array(b, v) = l.split("\t")
      b.toInt -> v
    }.toMap

  def alreadyApplied(batchId: Long): Boolean =
    Files.exists(root.resolve(s"_batch_$batchId"))

  private def bucketOf = pmod(hash(keyCols.map(col): _*), lit(nBuckets))

  private def bucketPath(version: String, bucket: Int) =
    root.resolve(version).resolve(s"$BucketCol=$bucket")

  /** Read the current snapshot (union of every bucket's current files), or
    * None before the first batch. */
  override def snapshot(spark: SparkSession): Option[DataFrame] = {
    val man = currentManifest
    if (man.isEmpty) None
    else Some(spark.read.parquet(
      man.toSeq.map { case (b, v) => bucketPath(v, b).toString }: _*))
  }

  /** Merge one micro-batch: for each bucket the batch touches, dedupe to
    * max-by-ordering per key across (bucket snapshot ∪ batch rows), write
    * the bucket under `v<batchId>`, then atomically swap the manifest.
    * Buckets the batch does not touch are left byte-untouched on disk. */
  override def upsert(batch: DataFrame, batchId: Long): Unit = {
    if (alreadyApplied(batchId)) return
    val man = currentManifest
    val version = s"v$batchId"
    if (man.values.exists(_ == version)) {
      // Crash landed between the manifest swap and the marker write: the
      // batch's buckets are already live. Re-merging would overwrite the
      // very directories the merge plan reads (wedging recovery forever) —
      // just complete the interrupted commit.
      Files.writeString(root.resolve(s"_batch_$batchId"), "")
      return
    }
    val spark = batch.sparkSession
    // Touched-bucket discovery is metadata, not data: ≤ nBuckets ints.
    val touched = batch.select(bucketOf.as(BucketCol))
      .distinct().collect().map(_.getInt(0)).toSet
    if (touched.nonEmpty) {
      val prevPaths = touched.toSeq.sorted
        .flatMap(b => man.get(b).map(v => bucketPath(v, b).toString))
      val merged = prevPaths match {
        case Seq() => batch
        case ps => spark.read.parquet(ps: _*).unionByName(batch)
      }
      val w = Window.partitionBy(keyCols.map(col): _*)
        .orderBy(orderCols.map(c => col(c).desc): _*)
      merged
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .drop("_rn")
        .withColumn(BucketCol, bucketOf)
        .write.mode("overwrite").partitionBy(BucketCol)
        .parquet(root.resolve(version).toString)
      val nextMan = man ++ touched.map(_ -> version)
      val tmp = root.resolve(s"_latest.tmp.$batchId")
      Files.writeString(tmp,
        nextMan.toSeq.sorted.map { case (b, v) => s"$b\t$v" }.mkString("\n"))
      Files.move(tmp, latestPtr, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
      // GC (safe: the manifest swap above is already durable). Full sweep,
      // not just this batch's delta: any bucket dir the NEW manifest does
      // not reference is dead — including ones orphaned by a past crash
      // between a manifest swap and its GC (ADVICE r3) — and so is any
      // whole version dir no bucket references anymore.
      val live = nextMan.values.toSet
      versionsOnDisk.foreach { v =>
        if (!live(v)) deleteRecursively(v)
        else bucketDirsIn(v).foreach { b =>
          if (!nextMan.get(b).contains(v))
            deleteRecursively(s"$v/$BucketCol=$b")
        }
      }
    }
    Files.writeString(root.resolve(s"_batch_$batchId"), "")
  }

  /** Bucket ids that have a directory under `version` (metadata listing,
    * ≤ nBuckets entries). */
  private def bucketDirsIn(version: String): Seq[Int] = {
    import scala.jdk.CollectionConverters._
    val dir = root.resolve(version)
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith(s"$BucketCol="))
        .map(_.substring(BucketCol.length + 1).toInt).toSeq
      finally s.close()
    }
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
