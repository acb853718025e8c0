package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, max, min}
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryProgress}

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
    * repeated Verify/Bench runs leave `/tmp` bounded (ADVICE r2).
    *
    * Safety invariant (ADVICE r5): the hook may delete a checkpoint dir out
    * from under a RUNNING query, which would wedge it — but every harness
    * entry point ([[drain]]/[[drain2]] and the spec helpers) stops its query
    * in a `finally` before returning, so by the time the JVM reaches
    * shutdown hooks no streaming query handed one of these dirs is still
    * active. Callers that start long-lived queries outside the harness must
    * manage their own checkpoint dirs. */
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
    * precondition documented at [[graft.queries.StreamingQueries]].
    *
    * Totality (ADVICE r5): chunk bounds are computed in BigInt, so an id
    * span near `Long.MaxValue` cannot wrap negative and drop rows; rows with
    * a NULL `idCol` ride in the LAST chunk (range predicates would silently
    * drop them); and a DataFrame with no non-null ids still yields `n`
    * chunks (n−1 empty + the original), so callers' micro-batch counts —
    * s05's sentinel accounting, the bench's per-batch cost model — hold in
    * the degenerate case too. Every input row lands in exactly one chunk. */
  def rangeChunks(df: DataFrame, idCol: String, n: Int): Seq[DataFrame] = {
    val mm = df.agg(min(col(idCol)).cast("long"), max(col(idCol)).cast("long")).head()
    if (mm.isNullAt(0)) Seq.fill(n - 1)(df.limit(0)) :+ df
    else {
      val lo = BigInt(mm.getLong(0)); val span = BigInt(mm.getLong(1)) - lo + 1
      (0 until n).map { k =>
        val lb = (lo + span * k / n).toLong
        if (k == n - 1) df.filter(col(idCol) >= lb || col(idCol).isNull)
        else df.filter(col(idCol) >= lb &&
          col(idCol) < (lo + span * (k + 1) / n).toLong)
      }
    }
  }

  /** Shuffle-partition count for harness-driven streaming queries. A
    * stateful operator creates one state store per shuffle partition per
    * batch, and each store pays a checkpoint commit every trigger — so the
    * partition count should track STATE SIZE, not CPU count (VERDICT r5:
    * `local[32]`'s default 32 stores × per-batch commits dominated
    * s08/s09/s10 at a few thousand keys). The count is baked into the
    * checkpoint at query start; the harness hands out a fresh checkpoint per
    * run, so overriding per-drain is safe. On a real cluster this is sized
    * as total state / comfortable-store-size, independent of executor count. */
  val StreamShufflePartitions: Int = 4

  /** Run `body` with `partitions` as the session's shuffle partition count,
    * restoring the caller's setting afterwards (batch queries outside the
    * drain keep their cluster-sized parallelism). */
  private def withStreamShuffle[T](spark: SparkSession,
      partitions: Int = StreamShufflePartitions)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, partitions.toString)
    try body
    finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  /** Feed `chunks` through `source` one micro-batch at a time (chunk
    * boundaries = batch boundaries), draining after each chunk, then stop.
    * `start` receives the raw-line streaming DataFrame (single `value`
    * column) and must start the query. */
  def drain(spark: SparkSession, source: StreamSource, chunks: Seq[DataFrame])(
      start: DataFrame => StreamingQuery): Unit =
    drainPublish(spark, source, chunks.map(c => () => source.append(c)))(start)

  /** [[drain]] generalized over the publish step: each element publishes one
    * micro-batch's lines — a DataFrame append or a staged-file link
    * ([[FileStreamSource.appendStaged]]) — and the query drains after each.
    * The staged form removes the per-query feed re-render (guide §1.2: the
    * distributed algorithm first — don't compute what a previous identical
    * job already rendered), leaving the engine's micro-batch machinery
    * itself as the timed cost. */
  def drainPublish(spark: SparkSession, source: StreamSource,
                   publish: Seq[() => Unit])(
      start: DataFrame => StreamingQuery): Unit =
    withStreamShuffle(spark) {
      val q = start(source.open(spark))
      try publish.foreach { p => p(); q.processAllAvailable() }
      finally q.stop()
    }

  /** Two-source sibling of [[drainPublish]]: both publish lists advance in
    * lockstep (publish boundaries = batch boundaries on both sides). */
  def drain2Publish(spark: SparkSession,
                    sourceA: StreamSource, publishA: Seq[() => Unit],
                    sourceB: StreamSource, publishB: Seq[() => Unit])(
      start: (DataFrame, DataFrame) => StreamingQuery): Unit =
    withStreamShuffle(spark) {
      val q = start(sourceA.open(spark), sourceB.open(spark))
      try publishA.map(Option(_)).zipAll(publishB.map(Option(_)), None, None)
        .foreach { case (a, b) =>
          a.foreach(_())
          b.foreach(_())
          q.processAllAvailable()
        } finally q.stop()
    }

  /** [[drain]] variant that also returns each data-carrying micro-batch's
    * processing time in ms, read from the query's progress log after the
    * feed drains. `triggerExecution` is Structured Streaming's end-to-end
    * per-trigger duration — offset resolution + planning + execution + sink
    * commit — which is the number that must stay under the trigger interval
    * for a backlog not to grow (the DStream stability condition the
    * reference's 1 s interval implies, `IOTSparkStreaming.scala:29` /
    * BASELINE.md "streaming latency"). No-data triggers are excluded: they
    * measure idle polling, not the pipeline. */
  def drainMeasured(spark: SparkSession, source: StreamSource,
                    chunks: Seq[DataFrame])(
      start: DataFrame => StreamingQuery): Seq[Long] =
    drainProgressed(spark, source, chunks)(start)
      .map(_.durationMs.get("triggerExecution").longValue())

  /** [[drainMeasured]] generalized to return the full per-batch
    * [[StreamingQueryProgress]] objects for data-carrying triggers — the
    * stateful scale probes read state-store row counts
    * (`stateOperators.numRowsTotal`) alongside trigger times, the evidence
    * that watermarks bound state in stream length (VERDICT r13 #1).
    * `partitions` overrides the state-sized shuffle-partition default so a
    * probe can measure the partition-count axis explicitly. */
  def drainProgressed(spark: SparkSession, source: StreamSource,
                      chunks: Seq[DataFrame],
                      partitions: Int = StreamShufflePartitions)(
      start: DataFrame => StreamingQuery): Seq[StreamingQueryProgress] =
    withStreamShuffle(spark, partitions) {
      val q = start(source.open(spark))
      try {
        chunks.foreach { chunk =>
          source.append(chunk)
          q.processAllAvailable()
        }
        q.recentProgress.toSeq.filter(_.numInputRows > 0)
      } finally q.stop()
    }

  /** Two-source variant of [[drainProgressed]] (stream-stream probes). */
  def drain2Progressed(spark: SparkSession,
                       sourceA: StreamSource, chunksA: Seq[DataFrame],
                       sourceB: StreamSource, chunksB: Seq[DataFrame],
                       partitions: Int = StreamShufflePartitions)(
      start: (DataFrame, DataFrame) => StreamingQuery): Seq[StreamingQueryProgress] =
    withStreamShuffle(spark, partitions) {
      val q = start(sourceA.open(spark), sourceB.open(spark))
      try {
        chunksA.map(Option(_)).zipAll(chunksB.map(Option(_)), None, None)
          .foreach { case (a, b) =>
            a.foreach(sourceA.append)
            b.foreach(sourceB.append)
            q.processAllAvailable()
          }
        q.recentProgress.toSeq.filter(_.numInputRows > 0)
      } finally q.stop()
    }

  /** Two-source variant of [[drain]] for stream-stream operators: both
    * feeds advance in lockstep chunks (chunk boundaries = batch boundaries
    * on both sides). */
  def drain2(spark: SparkSession,
             sourceA: StreamSource, chunksA: Seq[DataFrame],
             sourceB: StreamSource, chunksB: Seq[DataFrame])(
      start: (DataFrame, DataFrame) => StreamingQuery): Unit =
    drain2Publish(spark,
      sourceA, chunksA.map(c => () => sourceA.append(c)),
      sourceB, chunksB.map(c => () => sourceB.append(c)))(start)
}
