package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StringType

/** The raw-stream source seam (SURVEY.md §7.1): the reference selects its
  * Kafka broker from config (`IOTSparkStreaming.scala:33-40,43-44`); this
  * engine selects a [[StreamSource]] implementation. Everything downstream —
  * demux, typed parse, classifiers, sinks — consumes only the single
  * `value` string column [[open]] promises, so a production Kafka adapter
  * is one more implementation (`spark.readStream.format("kafka")...select(
  * col("value").cast("string"))`) with zero pipeline changes.
  *
  * Both sides of the seam are distributed: [[append]] takes a DataFrame of
  * lines and ships it through a cluster-side write (see [[FileFeed]]), never
  * through the driver. The registered streaming queries
  * ([[graft.queries.StreamingQueries]]) all run on [[FileStreamSource]];
  * the test tree adds a `MemoryStream`-backed implementation for specs that
  * need precise in-process batch control.
  */
trait StreamSource {
  /** Open the raw-line streaming DataFrame (single string column `value`). */
  def open(spark: SparkSession): DataFrame

  /** Publish one chunk of raw lines (single string column) to the stream.
    * Lines appended between two `processAllAvailable` calls form one
    * micro-batch — the harness's stand-in for broker arrival batching. */
  def append(chunk: DataFrame): Unit
}

/** Watched-directory source: Spark's file stream over text files — the
  * production-shaped default in this zero-egress env. Reads are exactly-once
  * via the file source's checkpointed file log; writes land distributed
  * through [[FileFeed]], so no line ever funnels through the driver. */
final class FileStreamSource(val dir: String,
                             maxFilesPerTrigger: Option[Int] = None)
    extends StreamSource {
  Files.createDirectories(Paths.get(dir))
  override def open(spark: SparkSession): DataFrame = {
    // The optional per-trigger file cap is the file source's admission
    // control — with Trigger.AvailableNow (s19) it bounds each catch-up
    // batch the way maxOffsetsPerTrigger bounds a Kafka backlog drain.
    val r = spark.readStream
    maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n)).text(dir)
  }
  override def append(chunk: DataFrame): Unit = FileFeed.append(chunk, dir)

  /** Publish a PRE-RENDERED chunk: hard-link (copy if the staging dir sits
    * on another filesystem) every data part-file of `stagedDir` into the
    * watched dir under a chunk-unique name. The bytes entering the stream
    * are exactly the staged render's — only the transport differs (a
    * metadata link instead of a re-render job), mirroring how a broker
    * serves the same log segment to every consumer group. Metadata files
    * (`_SUCCESS`, hidden names) are skipped, matching the file source's own
    * listing filter. */
  def appendStaged(stagedDir: String): Unit = {
    val src = Paths.get(stagedDir)
    val s = Files.list(src)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter { p =>
          val n = p.getFileName.toString
          Files.isRegularFile(p) && !n.startsWith("_") && !n.startsWith(".")
        }
        .foreach { p =>
          val tgt = Paths.get(dir).resolve(s"${src.getFileName}-${p.getFileName}")
          // Fall back to a copy ONLY when hard links are genuinely
          // unavailable (cross-filesystem staging, a filesystem without
          // link support). Real failures — permissions, a duplicate publish
          // into the same watched dir, a missing staged file — must
          // propagate here rather than resurface as a confusing secondary
          // error from the copy path (ADVICE r17).
          try Files.createLink(tgt, p)
          catch {
            case _: UnsupportedOperationException => Files.copy(p, tgt); ()
            case e: java.nio.file.FileSystemException
                if !e.isInstanceOf[java.nio.file.FileAlreadyExistsException] &&
                  !e.isInstanceOf[java.nio.file.AccessDeniedException] &&
                  !e.isInstanceOf[java.nio.file.NoSuchFileException] =>
              Files.copy(p, tgt); ()
          }
        }
    } finally s.close()
  }
}

/** Distributed feed writer for [[FileStreamSource]]: renders a one-column
  * DataFrame of lines as text part-files directly from the executors
  * (`df.write.text`), the role Kafka producers play in production. The file
  * stream source picks up the new part-files on its next trigger. */
object FileFeed {
  def append(lines: DataFrame, dir: String): Unit = {
    val fields = lines.schema.fields
    require(fields.length == 1 && fields(0).dataType == StringType,
      s"FileFeed expects a single string column, got ${lines.schema.simpleString}")
    lines.toDF("value").write.mode("append").text(dir)
  }
}
