package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, max, min}
import org.apache.spark.sql.streaming.StreamingQuery

/** Drives a real `StreamingQuery` to completion over a [[StreamSource]] —
  * the deterministic stand-in for the reference's Kafka subscription
  * (`IOTSparkStreaming.scala:43-44`) in this zero-egress env. The transform
  * and sink under test are genuine Structured Streaming (micro-batch
  * execution, checkpointing, watermarks); only the byte transport is
  * simulated, exactly as SURVEY.md §7.1 prescribes. Feed chunks are
  * DataFrames published through [[StreamSource.append]] (distributed for
  * [[FileStreamSource]]) — nothing funnels through the driver.
  */
object StreamHarness {

  /** Every temp/checkpoint dir handed out is deleted on JVM exit, so
    * repeated Verify/Bench runs leave `/tmp` bounded (ADVICE r2). */
  private val createdDirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]()
  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    createdDirs.forEach { dir =>
      try {
        if (Files.exists(dir)) {
          val s = Files.walk(dir)
          try {
            import scala.jdk.CollectionConverters._
            s.sorted(java.util.Comparator.reverseOrder())
              .iterator().asScala.foreach(Files.deleteIfExists(_))
          } finally s.close()
        }
      } catch { case _: Exception => () } // best-effort; never block shutdown
    }))

  private def tracked(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    createdDirs.add(p)
    p.toString
  }

  /** Fresh checkpoint dir per run (Structured Streaming requires one per
    * query; uniqueness keeps Verify/Bench reruns independent). */
  def checkpointDir(tag: String): String = tracked(s"graft-ckpt-$tag-")

  def tempDir(tag: String): String = tracked(s"graft-$tag-")

  /** Split `df` into `n` chunk DataFrames by contiguous ranges of `idCol`
    * ascending — chunk k covers ids in `[lo + k*span/n, lo + (k+1)*span/n)`.
    * The only driver contact is a two-value min/max aggregate (bounds, not
    * data): the rows themselves stay distributed end-to-end, unlike the
    * r3 harness's collected feed. Because the ranges ascend, a feed whose
    * event times are near-monotone in `idCol` keeps the watermark-safety
    * precondition documented at [[graft.queries.StreamingQueries]]. */
  def rangeChunks(df: DataFrame, idCol: String, n: Int): Seq[DataFrame] = {
    val mm = df.agg(min(col(idCol)).cast("long"), max(col(idCol)).cast("long")).head()
    if (mm.isNullAt(0)) Seq(df)
    else {
      val lo = mm.getLong(0); val span = mm.getLong(1) - lo + 1
      (0 until n).map { k =>
        df.filter(col(idCol) >= lo + span * k / n &&
          col(idCol) < lo + span * (k + 1) / n)
      }
    }
  }

  /** Feed `chunks` through `source` one micro-batch at a time (chunk
    * boundaries = batch boundaries), draining after each chunk, then stop.
    * `start` receives the raw-line streaming DataFrame (single `value`
    * column) and must start the query. */
  def drain(spark: SparkSession, source: StreamSource, chunks: Seq[DataFrame])(
      start: DataFrame => StreamingQuery): Unit = {
    val q = start(source.open(spark))
    try chunks.foreach { chunk =>
      source.append(chunk)
      q.processAllAvailable()
    } finally q.stop()
  }

  /** Two-source variant of [[drain]] for stream-stream operators: both
    * feeds advance in lockstep chunks (chunk boundaries = batch boundaries
    * on both sides). */
  def drain2(spark: SparkSession,
             sourceA: StreamSource, chunksA: Seq[DataFrame],
             sourceB: StreamSource, chunksB: Seq[DataFrame])(
      start: (DataFrame, DataFrame) => StreamingQuery): Unit = {
    val q = start(sourceA.open(spark), sourceB.open(spark))
    try chunksA.map(Option(_)).zipAll(chunksB.map(Option(_)), None, None)
      .foreach { case (a, b) =>
        a.foreach(sourceA.append)
        b.foreach(sourceB.append)
        q.processAllAvailable()
      } finally q.stop()
  }
}
