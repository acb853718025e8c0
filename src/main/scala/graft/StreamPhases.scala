package graft

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.{FileStreamSource, StreamHarness, UpsertSink, Wire}
import graft.streaming.StreamPipelines._

/** Scratch phase-attribution probe for the streaming drain (not part of the
  * driver contract): times each fixed-cost phase of a registered-shape
  * streaming query — feed chunking (min/max bounds agg), per-chunk
  * render+publish jobs, query start, per-batch drain, stop, and result
  * readback — so the optimization round steers by a measured breakdown of
  * the s-family's per-query cost instead of the bench total (guide §1:
  * measure first; the s-series is ~45% of the sf0.1 bench).
  */
object StreamPhases {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def ms[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e6)
    }

    // Job-level attribution: record every Spark job's wall duration and
    // description so the per-batch cost splits into its constituent jobs
    // (stream batch, sink touched-bucket collect, sink merge write, ...).
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(js.jobId, (js.time,
          Option(js.properties.getProperty("spark.job.description")).getOrElse("-")))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null) jobs.add((je.jobId, je.time - s._1, s._2))
      }
    })

    /** One s02-shaped run with per-phase timers (mirrors the registered
      * body; the registered query itself is untouched). */
    def s02Phased(): Seq[(String, Double)] = {
      val buf = scala.collection.mutable.ArrayBuffer[(String, Double)]()
      val (chunks, tChunk) = ms {
        StreamHarness.rangeChunks(Tables.load(spark, dir, "events"), "event_id", 2)
          .map(_.select(Wire.fitbitLine.as("value")))
      }
      buf += ("bounds_agg" -> tChunk)
      val src = new FileStreamSource(StreamHarness.tempDir("ph-s02-feed"))
      val sink = new UpsertSink(StreamHarness.tempDir("ph-s02-loc"),
        Seq("user_id"), Seq("ver", "long", "lat"))
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        val (q, tStart) = ms {
          locations(parseFitbit(src.open(spark)))
            .writeStream
            .option("checkpointLocation", StreamHarness.checkpointDir("ph-s02"))
            .foreachBatch { (b: DataFrame, id: Long) => sink.upsert(b, id) }
            .start()
        }
        buf += ("query_start" -> tStart)
        try {
          chunks.zipWithIndex.foreach { case (c, i) =>
            val (_, tApp) = ms(src.append(c))
            buf += (s"append_$i" -> tApp)
            val (_, tProc) = ms(q.processAllAvailable())
            buf += (s"batch_$i" -> tProc)
          }
        } finally {
          val (_, tStop) = ms(q.stop())
          buf += ("stop" -> tStop)
        }
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      val (_, tRead) = ms {
        sink.snapshot(spark).get
          .select(col("user_id"), col("lat"), col("long"), col("ver").as("last_ms"))
          .orderBy(col("user_id"))
          .write.format("noop").mode("overwrite").save()
      }
      buf += ("readback_noop" -> tRead)
      buf.toSeq
    }

    /** s01-shaped (memory sink, no foreachBatch) with the same timers. */
    def s01Phased(): Seq[(String, Double)] = {
      val buf = scala.collection.mutable.ArrayBuffer[(String, Double)]()
      val (chunks, tChunk) = ms {
        StreamHarness.rangeChunks(Tables.load(spark, dir, "events"), "event_id", 2)
          .map(_.select(Wire.fitbitLine.as("value")))
      }
      buf += ("bounds_agg" -> tChunk)
      val src = new FileStreamSource(StreamHarness.tempDir("ph-s01-feed"))
      val qn = "ph_s01_" + UUID.randomUUID().toString.replace("-", "")
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        val (q, tStart) = ms {
          warningAlerts(parseFitbit(src.open(spark)))
            .select(col("user_id"), col("age"), col("pulse"), col("warning"),
              col("machine_ts"))
            .writeStream.format("memory").queryName(qn)
            .option("checkpointLocation", StreamHarness.checkpointDir("ph-s01"))
            .outputMode("append").start()
        }
        buf += ("query_start" -> tStart)
        try {
          chunks.zipWithIndex.foreach { case (c, i) =>
            val (_, tApp) = ms(src.append(c))
            buf += (s"append_$i" -> tApp)
            val (_, tProc) = ms(q.processAllAvailable())
            buf += (s"batch_$i" -> tProc)
          }
        } finally {
          val (_, tStop) = ms(q.stop())
          buf += ("stop" -> tStop)
        }
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      val (_, tRead) = ms {
        spark.table(qn).orderBy(col("user_id"), col("machine_ts"), col("pulse"),
          col("warning"), col("age"))
          .write.format("noop").mode("overwrite").save()
      }
      buf += ("readback_noop" -> tRead)
      buf.toSeq
    }

    // Warm up the JVM/codegen once, then report each rep's phases.
    s01Phased()
    for (r <- 1 to reps) {
      for ((tag, run) <- Seq("s01" -> (() => s01Phased()), "s02" -> (() => s02Phased()))) {
        jobs.clear()
        val phases = run()
        val total = phases.map(_._2).sum
        println(f"[phases] rep=$r $tag total=${total / 1000}%.2fs " +
          phases.map { case (k, v) => f"$k=${v / 1000}%.2f" }.mkString(" "))
        import scala.jdk.CollectionConverters._
        val js = jobs.asScala.toSeq.sortBy(_._1)
        println(s"[jobs] rep=$r $tag n=${js.size} " +
          js.map { case (id, d, desc) =>
            s"j$id=${d}ms(${desc.linesIterator.take(1).mkString.take(40).replace(' ', '_')})"
          }.mkString(" "))
      }
    }
    spark.stop()
  }
}
