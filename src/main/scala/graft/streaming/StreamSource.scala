package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The raw-stream source seam (SURVEY.md §7.1): the reference selects its
  * Kafka broker from config (`IOTSparkStreaming.scala:33-40,43-44`); this
  * engine selects a [[StreamSource]] implementation. Everything downstream —
  * demux, typed parse, classifiers, sinks — consumes only the single
  * `value` string column this trait promises, so a production Kafka adapter
  * is one more implementation (`spark.readStream.format("kafka")...select(
  * col("value").cast("string"))`) with zero pipeline changes.
  *
  * Bundled implementations:
  *  - [[FileStreamSource]] — the production-shaped default in this
  *    zero-egress env: a watched directory of line files, read by Spark's
  *    file stream source (exactly-once via the checkpointed file log).
  *    Data reaches the directory distributed ([[FileFeed]]); nothing ever
  *    funnels through the driver.
  *  - [[MemoryStreamSource]] — in-process feed for unit tests needing
  *    precise per-batch control.
  */
trait StreamSource {
  /** Open the raw-line streaming DataFrame (single string column `value`). */
  def open(spark: SparkSession): DataFrame
}

/** Watched-directory source: Spark's file stream over text files. */
final class FileStreamSource(val dir: String) extends StreamSource {
  override def open(spark: SparkSession): DataFrame = spark.readStream.text(dir)
}

/** In-process source for tests: wraps a `MemoryStream[String]`, exposing
  * explicit batch control via [[append]]. */
final class MemoryStreamSource(spark: SparkSession) extends StreamSource {
  private implicit val ctx: org.apache.spark.sql.classic.SQLContext =
    spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
  private implicit val enc: org.apache.spark.sql.Encoder[String] =
    org.apache.spark.sql.Encoders.STRING
  private val mem =
    org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]

  override def open(spark: SparkSession): DataFrame = mem.toDF()

  def append(lines: Seq[String]): Unit = mem.addData(lines)
}
