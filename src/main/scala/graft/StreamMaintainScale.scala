package graft

import org.apache.spark.sql.SparkSession

import graft.queries.StreamingQueries
import graft.sources.Tables

/** Scale evidence for the s28/s30 streaming ANN maintenance drain (VERDICT
  * r14 next #2) — the one heavy streaming path with no committed
  * measurement: foreachBatch append-merge plus the per-batch recall
  * monitor. Drives [[StreamingQueries.s28Maintain]] with `monitor = true`
  * over cells of (corpus, chunk count) and collects each micro-batch's
  * per-phase wall time through the phase sink the drain exposes:
  *
  *  - `compact`     — the standing tables' periodic part compaction
  *    (VERDICT r15 next #1, TIERED since r17 — VERDICT r16 next #5):
  *    every [[StreamingQueries.CompactEvery]] committed increments fold
  *    into a leveled snapshot run, cascading LSM-style, so the read
  *    phases below are bounded at one snapshot + a handful of parts instead
  *    of re-reading the whole drain history each batch. Near-zero most
  *    batches, a periodic amortized spike on compacting ones;
  *  - `route_admit` — wire parse, int8 two-level routing, first-seen-wins
  *    admission (localCheckpoint action); expected O(rows/batch · n^¼);
  *  - `edges`       — the append-merge candidate join: this batch's probes
  *    vs base ∪ admitted-so-far (e1) PLUS stored probe lists vs this
  *    batch's admissions (e2), written to the batch's edge part. e2 reads
  *    every earlier batch's probe list, so within a drain this phase's
  *    read side grows with arrived-so-far — the "only argued" cost r14
  *    flagged; this artifact measures its slope;
  *  - `post_probe`  — the two standing-table appends (postings, probes);
  *  - `monitor`     — the e20 alert surface over the index as it stands:
  *    MonitorQ-sample exact leg (MonitorQ·n dots — linear in corpus size
  *    BY DESIGN; the corpus axis of this artifact is the check) + merged
  *    top-K approx leg + the RecallAlertBus post (the s30 wire).
  *
  * Cells: `dir:chunks` pairs — the corpus axis (sf0.1 → derived/x10 →
  * derived/x100, 60k → 600k → 6M vectors, increment = n/10) separates
  * already-merged corpus size from rows/batch, and the chunks axis at a
  * fixed corpus (x10 at 32/8/2 chunks ⇒ 1.9k/7.5k/30k rows/batch) varies
  * rows/batch alone. The base-index build per corpus is untimed setup
  * (a deployment builds it once; [[graft.IndexBuildTime]] times it).
  *
  * Env: SPARK_GRAFT_SMS_CELLS (default
  * "sf0.1:8,x10:32,x10:8,x10:2,x100:8"), SPARK_GRAFT_SMS_OUT (default
  * stream_maintain_scale.json), SPARK_GRAFT_CPUS. */
object StreamMaintainScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val cells = sys.env.getOrElse("SPARK_GRAFT_SMS_CELLS",
      "sf0.1:8,x10:32,x10:8,x10:2,x100:8")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      .map { c => val Array(d, n) = c.split(":"); (d, n.toInt) }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Scan-parallelism floor derived from core count (Bench's rationale).
      .config("spark.sql.files.minPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_MIN_SPLITS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src = sys.env.getOrElse("SPARK_GRAFT_SCALEUP_SRC", "/root/testdata/sf0.1")
    def resolve(tag: String): String = tag match {
      case "sf0.1" => src
      case "x10" => { ScaleUp.ensure(spark, src, "derived/x10", 10); "derived/x10" }
      case "x100" => { ScaleUp.ensure(spark, src, "derived/x100", 100); "derived/x100" }
      case other => other // explicit path; self-ensure only for derived dirs
    }

    val phaseNames =
      Seq("compact", "route_admit", "edges", "post_probe", "monitor", "total")
    val cellJsons = cells.map { case (tag, chunks) =>
      val dir = resolve(tag)
      val n = Tables.load(spark, dir, "embeddings").count()
      graft.streaming.RecallAlertBus.drain()
      val buf = new scala.collection.mutable.ArrayBuffer[(Long, String, Double)]()
      val sink = (id: Long, phase: String, sec: Double) =>
        buf.synchronized { buf += ((id, phase, sec)); () }
      val t = StreamingQueries.s28Maintain(spark, dir, monitor = true,
        chunksN = chunks, phaseSink = Some(sink))
      val alerts = graft.streaming.RecallAlertBus.drain()
      val byBatch = buf.groupBy(_._1).toSeq.sortBy(_._1)
      val batchesJson = byBatch.map { case (id, rows) =>
        val ph = rows.map(r => r._2 -> r._3).toMap
        s"""{"id":$id,""" + phaseNames.map(p =>
          s""""$p":${"%.2f".format(ph.getOrElse(p, 0.0))}""").mkString(",") + "}"
      }.mkString("[", ",", "]")
      val medians = phaseNames.map { p =>
        val xs = buf.filter(_._2 == p).map(_._3).toSeq
        s""""$p":${"%.2f".format(if (xs.isEmpty) 0.0 else Stats.median(xs))}"""
      }.mkString(",")
      val incr = n - t.nBase
      val cell =
        s""""$tag/chunks=$chunks":{"n_corpus":$n,"n_base":${t.nBase},""" +
          s""""rows_per_batch":${incr / math.max(chunks, 1)},""" +
          s""""alerts":${alerts.size},""" +
          s""""phase_medians":{$medians},"batches":$batchesJson}"""
      println(s"cell $tag/chunks=$chunks done: medians {$medians}")
      cell
    }
    val json =
      s"""{"stream_maintain_scale":{"monitor_q":${
        graft.queries.SimilarityQueries.MonitorQ},""" +
        s""""cells":${cellJsons.mkString("{", ",", "}")}}}"""
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_SMS_OUT", "stream_maintain_scale.json")
    val wrote = ArtifactOut.write(out, json)
    spark.stop()
    if (!wrote) sys.exit(2)
  }
}
