package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

/** Drives a real `StreamingQuery` to completion over an in-process source —
  * the deterministic stand-in for the reference's Kafka direct stream
  * (`IOTSparkStreaming.scala:43-44`) in this zero-egress env. The transform
  * and sink under test are genuine Structured Streaming (micro-batch
  * execution, checkpointing, watermarks); only the byte transport is
  * simulated, exactly as SURVEY.md §7.1 prescribes (`StreamSource` behind a
  * trait, Kafka adapter as a config-selected drop-in later).
  */
object StreamHarness {

  /** Fresh checkpoint dir per run (Structured Streaming requires one per
    * query; uniqueness keeps Verify/Bench reruns independent). */
  def checkpointDir(tag: String): String =
    Files.createTempDirectory(s"graft-ckpt-$tag-").toString

  def tempDir(tag: String): String =
    Files.createTempDirectory(s"graft-$tag-").toString

  /** Feed `lines` through a MemoryStream in `nChunks` micro-batches (chunk
    * boundaries = batch boundaries), draining after each chunk, then stop.
    * `start` receives the raw-line streaming DataFrame (single `value`
    * column) and must start the query.
    *
    * The driver-side iteration over `lines` is source-harness plumbing (the
    * role Kafka brokers play in production), not operator logic — every
    * transform downstream runs distributed inside the micro-batch engine.
    */
  def drainChunked(spark: SparkSession, lines: Seq[String], nChunks: Int)(
      start: DataFrame => StreamingQuery): Unit = {
    implicit val ctx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    implicit val enc: org.apache.spark.sql.Encoder[String] =
      org.apache.spark.sql.Encoders.STRING
    val mem = MemoryStream[String]
    val q = start(mem.toDF())
    try {
      val sz = math.max(1, (lines.length + nChunks - 1) / nChunks)
      lines.grouped(sz).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
  }

  /** Two-source variant of [[drainChunked]] for stream-stream operators:
    * both feeds advance in lockstep chunks (chunk boundaries = batch
    * boundaries on both sides). */
  def drainChunked2(spark: SparkSession, linesA: Seq[String], linesB: Seq[String],
                    nChunks: Int)(
      start: (DataFrame, DataFrame) => StreamingQuery): Unit = {
    implicit val ctx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    implicit val enc: org.apache.spark.sql.Encoder[String] =
      org.apache.spark.sql.Encoders.STRING
    val memA = MemoryStream[String]
    val memB = MemoryStream[String]
    val q = start(memA.toDF(), memB.toDF())
    try {
      val szA = math.max(1, (linesA.length + nChunks - 1) / nChunks)
      val szB = math.max(1, (linesB.length + nChunks - 1) / nChunks)
      linesA.grouped(szA).zipAll(linesB.grouped(szB), Seq.empty, Seq.empty)
        .foreach { case (a, b) =>
          if (a.nonEmpty) memA.addData(a)
          if (b.nonEmpty) memB.addData(b)
          q.processAllAvailable()
        }
    } finally q.stop()
  }

  /** Collect a single string column to an ordered line feed. */
  def collectLines(df: DataFrame, column: String = "line"): Seq[String] =
    df.select(column).collect().toSeq.map(_.getString(0))
}
