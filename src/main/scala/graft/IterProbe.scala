package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Iteration-state probe for the loop-shaped queries (VERDICT r17 next #4):
  * runs q42 (engine-driven `WITH RECURSIVE`) and q47 (hand-rolled per-round
  * loop with lazy localCheckpoint lineage truncation) under a SparkListener
  * that records every job's wall time, and emits one JSON artifact
  * (`iter_probe.json`) with the per-job breakdown. What the numbers must
  * show, and why:
  *
  *  - q47: one cheap convergence-probe job per round (the `max(cur)`
  *    action, which also materializes that round's lazy checkpoint).
  *    FLAT per-round cost — a job list whose durations do NOT grow with
  *    round index — is the direct evidence that the per-round
  *    `localCheckpoint` truncates lineage (an untruncated loop re-executes
  *    the whole history, so round k costs O(k) and the tail dominates;
  *    ConnectedComponents measured ~2.6× growth per round in that failure
  *    mode).
  *  - q42: the recursion is driven INSIDE the engine's UnionLoop execution,
  *    so the probe records how many scheduler jobs the whole query costs;
  *    depth (log₂ max key ≈ 17 at sf0.1) shows up as per-iteration
  *    stages/jobs the engine manages, not as driver-loop actions.
  *
  * Scratch measurement main — not part of the driver contract. */
object IterProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.minPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_MIN_SPLITS", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        starts.put(e.jobId, e.time); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val s = starts.remove(e.jobId)
        jobs.add((e.jobId, e.time - s)); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def probe(name: String): (Double, Seq[(Int, Long)]) = {
      jobs.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async; a short settle keeps the last job's end
      // event from missing the snapshot (private listenerBus — no public
      // waitUntilEmpty)
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      (wall, jobs.iterator().asScala.toSeq.sortBy(_._1))
    }

    // one untimed warmup so codegen/scan caches don't pollute job 0
    probe("q47_iter_hierarchy")
    val out = Seq("q47_iter_hierarchy", "q42_recursive_cte").map { n =>
      val (wall, js) = probe(n)
      val ms = js.map(_._2)
      val perJob = ms.mkString("[", ",", "]")
      // flatness: max over median of the PER-ROUND jobs (drop the final
      // output job, which sorts the full result and is legitimately larger)
      val rounds = if (ms.size > 2) ms.dropRight(1) else ms
      val med = rounds.sorted.apply(rounds.size / 2).toDouble
      val flat = if (med > 0) rounds.max / med else 0.0
      s""""$n":{"wall_sec":$wall,"n_jobs":${ms.size},"job_ms":$perJob,"round_max_over_median":${"%.2f".format(flat)}}"""
    }
    val json = s"""{"dir":"$dir","cpus":$cpus,${out.mkString(",")}}"""
    println(json)
    ArtifactOut.write(
      sys.env.getOrElse("SPARK_GRAFT_ITER_OUT", "iter_probe.json"), json)
    spark.stop()
  }
}
