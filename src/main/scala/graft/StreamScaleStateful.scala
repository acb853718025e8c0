package graft

import org.apache.spark.sql.SparkSession

import graft.streaming.ScaleProbes

/** Stateful-streaming scale evidence (VERDICT r13 next #1, r14 next #1):
  * drives the two expensive stateful shapes — the s05-shaped watermarked
  * windowed aggregation and the s10-shaped watermark-bounded stream-stream
  * join ([[ScaleProbes]]) — over a 3×3 grid of rows/batch × key cardinality
  * and writes `stream_scale_stateful.json`. Each cell reports per-batch
  * trigger time (median / p99 / max) plus the FLATNESS evidence the 100 TB
  * argument needs: the second-half-of-stream median over the first-half
  * median (state bounded by the watermark ⇒ late batches cost what early
  * batches cost), and the state-row series' last/max values (eviction ⇒
  * plateau, not growth). [[graft.streaming.StatefulScaleSpec]] pins the
  * plateau semantics; this main carries the timings at scale.
  *
  * Round 14's finding was that the heavy JOIN cells are commit-dominated:
  * the symmetric hash join keeps 4 state stores per side per partition and
  * the default HDFS-backed provider writes one full delta file per store
  * per batch. The two levers for that regime are measured here as LEGS —
  * `pipeline:provider:partitions` triples (SPARK_GRAFT_SS_LEGS), each run
  * over the full rows×keys grid:
  *
  *  - provider `hdfs`     — HDFSBackedStateStoreProvider (Spark default);
  *  - provider `rocksdb`  — RocksDBStateStoreProvider, full-snapshot
  *    checkpointing;
  *  - provider `rocksdbcl`— RocksDB + changelog checkpointing (the
  *    production configuration: per-batch upload is the changelog, not the
  *    SST snapshot, so commit cost tracks the batch's delta, not state
  *    size);
  *  - partitions — state-store count per operator; sized as
  *    total-state / comfortable-store-size on a deployment (the heavy-cell
  *    column of the artifact measures exactly that lever).
  *
  * Cell keys carry the leg (`join/provider=rocksdbcl/parts=16/rows=…`), so
  * one artifact holds the whole provider×partitions comparison and every
  * cell is attributable to its configuration.
  *
  * Env: SPARK_GRAFT_SS_BATCHES (default 16), SPARK_GRAFT_SS_ROWS (default
  * "1000,10000,100000"), SPARK_GRAFT_SS_KEYS (default "1000,10000,100000"),
  * SPARK_GRAFT_SS_LEGS (default covers window baseline + join under all
  * three providers at harness-default and state-sized partition counts),
  * SPARK_GRAFT_SS_OUT (default stream_scale_stateful.json),
  * SPARK_GRAFT_CPUS. */
object StreamScaleStateful {

  /** providerClass value per leg name; `hdfs` is Spark's default provider
    * spelled explicitly so legs can alternate within one session. */
  private val ProviderClass = Map(
    "hdfs" ->
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    "rocksdb" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "rocksdbcl" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val batches = sys.env.getOrElse("SPARK_GRAFT_SS_BATCHES", "16").toInt
    val rowsAxis = sys.env.getOrElse("SPARK_GRAFT_SS_ROWS", "1000,10000,100000")
      .split(",").map(_.trim.toInt).toSeq
    val keysAxis = sys.env.getOrElse("SPARK_GRAFT_SS_KEYS", "1000,10000,100000")
      .split(",").map(_.trim.toInt).toSeq
    // Legs: pipeline:provider:partitions. Default = the window baseline at
    // the harness's 4 partitions plus the join pipeline under all three
    // providers at both the default and the state-sized partition count
    // (r14's heavy join cells plateau ~400k dense-side state rows; 16
    // stores ⇒ ~25k rows per store).
    val legs = sys.env.getOrElse("SPARK_GRAFT_SS_LEGS",
      "window:hdfs:4," +
        "join:hdfs:4,join:rocksdb:4,join:rocksdbcl:4," +
        "join:hdfs:16,join:rocksdb:16,join:rocksdbcl:16")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      .map { l =>
        val Array(pipe, prov, parts) = l.split(":")
        require(Set("window", "join")(pipe), s"unknown pipeline in leg $l")
        require(ProviderClass.contains(prov), s"unknown provider in leg $l")
        (pipe, prov, parts.toInt)
      }
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

    def probeOf(pipe: String): (SparkSession, Int, Int, Int, Int) => Seq[ScaleProbes.BatchPoint] =
      pipe match {
        case "window" => ScaleProbes.windowProbe(_, _, _, _, _)
        case "join"   => ScaleProbes.joinProbe(_, _, _, _, _)
      }

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

    val cells = legs.flatMap { case (pipe, prov, parts) =>
      // Provider is a session conf read at query start, so flipping it
      // between legs reconfigures every query the leg starts.
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        ProviderClass(prov))
      spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        (prov == "rocksdbcl").toString)
      val probe = probeOf(pipe)
      // One tiny unmeasured run per leg: codegen, file-source setup and the
      // provider's one-time costs (RocksDB native-lib load) happen once at
      // deployment start, so measured cells time steady-state batches, not
      // Janino or JNI bootstrap (the latencyProbe warmup discipline).
      probe(spark, 3, 100, 10, parts)
      for (r <- rowsAxis; k <- keysAxis) yield {
        val pts = probe(spark, batches, r, k, parts)
        require(pts.nonEmpty, s"no measured batches for $pipe rows=$r keys=$k")
        val key = s"$pipe/provider=$prov/parts=$parts/rows=$r/keys=$k"
        println(s"cell $key: ${cellJson(pts).take(220)}")
        s""""$key":${cellJson(pts)}"""
      }
    }
    val json =
      s"""{"stream_scale_stateful":{"watermark":"2 hours","batch_event_span_min":30,""" +
        s""""sink":"noop",""" +
        s""""legs":${legs.map { case (p, pr, pa) => s""""$p:$pr:$pa"""" }
          .mkString("[", ",", "]")},""" +
        s""""cells":${cells.mkString("{", ",", "}")}}}"""
    println(json)
    val outFile = sys.env.getOrElse("SPARK_GRAFT_SS_OUT", "stream_scale_stateful.json")
    val wrote = ArtifactOut.write(outFile, json)
    spark.stop()
    if (!wrote) sys.exit(2)
  }
}
