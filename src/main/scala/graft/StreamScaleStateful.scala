package graft

import org.apache.spark.sql.SparkSession

import graft.streaming.ScaleProbes

/** Stateful-streaming scale evidence (VERDICT r13 next #1): drives the two
  * expensive stateful shapes — the s05-shaped watermarked windowed
  * aggregation and the s10-shaped watermark-bounded stream-stream join
  * ([[ScaleProbes]]) — over a 3×3 grid of rows/batch × key cardinality and
  * writes `stream_scale_stateful.json`. Each cell reports per-batch trigger
  * time (median / p99 / max) plus the FLATNESS evidence the 100 TB argument
  * needs: the second-half-of-stream median over the first-half median
  * (state bounded by the watermark ⇒ late batches cost what early batches
  * cost), and the state-row series' last/max values (eviction ⇒ plateau,
  * not growth). [[graft.streaming.StatefulScaleSpec]] pins the plateau
  * semantics; this main carries the timings at scale.
  *
  * Env: SPARK_GRAFT_SS_BATCHES (default 16), SPARK_GRAFT_SS_ROWS (default
  * "1000,10000,100000"), SPARK_GRAFT_SS_KEYS (default "1000,10000,100000"),
  * SPARK_GRAFT_SS_OUT (default stream_scale_stateful.json),
  * SPARK_GRAFT_CPUS. */
object StreamScaleStateful {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val batches = sys.env.getOrElse("SPARK_GRAFT_SS_BATCHES", "16").toInt
    val rowsAxis = sys.env.getOrElse("SPARK_GRAFT_SS_ROWS", "1000,10000,100000")
      .split(",").map(_.trim.toInt).toSeq
    val keysAxis = sys.env.getOrElse("SPARK_GRAFT_SS_KEYS", "1000,10000,100000")
      .split(",").map(_.trim.toInt).toSeq
    // State-store provider knob: "rocksdb" switches the probes (and the
    // artifact's provider field) to RocksDBStateStoreProvider — the lever
    // for commit-dominated join cells (HDFS-backed stores pay one delta
    // file per store per batch; the symmetric hash join keeps 4 stores per
    // side per partition).
    val provider = sys.env.getOrElse("SPARK_GRAFT_SS_PROVIDER", "hdfs")
    val pipeFilter = sys.env.getOrElse("SPARK_GRAFT_SS_PIPELINES", "window,join")
      .split(",").map(_.trim).toSet
    // Shuffle/state partition count for the probes (default: the harness's
    // state-sized 4). On a real deployment this is sized as total state /
    // comfortable-store-size — the heavy-cell column of the artifact
    // measures exactly that lever.
    val partitions = sys.env.getOrElse("SPARK_GRAFT_SS_PARTITIONS",
      graft.streaming.StreamHarness.StreamShufflePartitions.toString).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (provider == "rocksdb")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    val allProbes: Seq[(String, (SparkSession, Int, Int, Int) => Seq[ScaleProbes.BatchPoint])] =
      Seq(
        "window" -> ((s, b, r, k) => ScaleProbes.windowProbe(s, b, r, k, partitions)),
        "join" -> ((s, b, r, k) => ScaleProbes.joinProbe(s, b, r, k, partitions)))
    val probes = allProbes.filter { case (n, _) => pipeFilter.contains(n) }

    def cellJson(pts: Seq[ScaleProbes.BatchPoint]): String = {
      // The FIRST data batch of a fresh query pays state-store/source
      // setup a deployment pays once at query start — reported separately
      // as startup_ms; median/p99/flatness cover the steady-state batches,
      // which are what the per-trigger stability bound governs (the same
      // reasoning as latencyProbe's unmeasured warmup drain). all_ms stays
      // raw so the split is auditable. median_input_rows is the OBSERVED
      // per-batch arrival count: an appended chunk may drain over two
      // triggers, so the nominal rows/batch is an upper bound, not a claim.
      val startup = pts.head.ms
      val steady = if (pts.size > 1) pts.tail else pts
      val ms = steady.map(_.ms)
      val (first, second) = ms.splitAt(ms.size / 2)
      val mFirst = Stats.medianMs(first)
      val mSecond = Stats.medianMs(second)
      val flat = if (mFirst > 0) mSecond / mFirst else 1.0
      val st = pts.map(_.stateRows)
      s"""{"batches":${pts.size},"startup_ms":$startup,""" +
        s""""median_input_rows":${Stats.medianMs(steady.map(_.inputRows))},""" +
        s""""median_batch_ms":${Stats.medianMs(ms)},""" +
        s""""p99_batch_ms":${Stats.percentileMs(ms, 0.99)},"max_batch_ms":${ms.max},""" +
        s""""median_first_half_ms":$mFirst,"median_second_half_ms":$mSecond,""" +
        s""""second_over_first":${"%.3f".format(flat)},""" +
        s""""state_rows_last":${st.last},"state_rows_max":${st.max},""" +
        s""""all_ms":${pts.map(_.ms).mkString("[", ",", "]")},""" +
        s""""all_state_rows":${st.mkString("[", ",", "]")}}"""
    }

    val cells = probes.flatMap { case (name, probe) =>
      // One tiny unmeasured run per pipeline: codegen + file-source setup
      // happen once at deployment start, so measured cells time steady-state
      // batches, not Janino (the latencyProbe warmup discipline).
      probe(spark, 3, 100, 10)
      for (r <- rowsAxis; k <- keysAxis) yield {
        val pts = probe(spark, batches, r, k)
        require(pts.nonEmpty, s"no measured batches for $name rows=$r keys=$k")
        val cell = s""""$name/rows=$r/keys=$k":${cellJson(pts)}"""
        println(s"cell $name rows=$r keys=$k: ${cellJson(pts).take(220)}")
        cell
      }
    }
    val json =
      s"""{"stream_scale_stateful":{"watermark":"2 hours","batch_event_span_min":30,""" +
        s""""sink":"noop","shuffle_partitions":$partitions,""" +
        s""""state_store":"$provider",""" +
        s""""cells":${cells.mkString("{", ",", "}")}}}"""
    println(json)
    val outFile = sys.env.getOrElse("SPARK_GRAFT_SS_OUT", "stream_scale_stateful.json")
    val wrote = ArtifactOut.write(outFile, json)
    spark.stop()
    if (!wrote) sys.exit(2)
  }
}
