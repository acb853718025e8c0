package graft

import org.apache.spark.sql.SparkSession

/** Standalone streaming-latency attestation: drives the s01-shaped flagship
  * pipeline at a configurable arrival rate and prints per-batch processing
  * times — the operational check behind Bench's `latency` block, runnable
  * on its own so a rate change can be measured without a full bench pass.
  *
  * Runs one leg per state-store provider (VERDICT r14 next #6): the r14
  * stateful-join artifact recommends RocksDB for commit-dominated cells,
  * and a deployment flips `spark.sql.streaming.stateStore.providerClass`
  * SESSION-WIDE — so the flagship's 1 s bound must be re-attested under
  * that setting too. The s01 pipeline is STATELESS (parse → classify →
  * filter → append), so the expectation is parity: the provider class is
  * only consulted by stateful operators, and a matching rocksdb leg is the
  * committed evidence that the recommendation is free for the flagship
  * rather than an argument that it should be. Top-level fields stay the
  * `hdfs` (default-provider) leg for artifact continuity; `legs` carries
  * both series.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_LAT_BATCHES (default 20),
  * SPARK_GRAFT_LAT_ROWS (default 10000), SPARK_GRAFT_LAT_PROVIDERS
  * (default "hdfs,rocksdb"). */
object Latency {
  private val ProviderClass = Map(
    "hdfs" ->
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    "rocksdb" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val batches = sys.env.getOrElse("SPARK_GRAFT_LAT_BATCHES", "20").toInt
    val rows = sys.env.getOrElse("SPARK_GRAFT_LAT_ROWS", "10000").toInt
    val provs = sys.env.getOrElse("SPARK_GRAFT_LAT_PROVIDERS", "hdfs,rocksdb")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(provs.nonEmpty && provs.forall(ProviderClass.contains),
      s"unknown provider in $provs")
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
    // Steady-state companion stats exclude the leg's first measured batch
    // (VERDICT r15 next #6): despite the probe's codegen warmup drain, the
    // measured query's batch 0 still pays per-query setup (checkpoint + file
    // source init + sink table creation) a long-running deployment pays
    // once — r15's hdfs p99 744 ms was batch 0 vs ~438 ms next-highest.
    // Both views are reported; neither replaces the other.
    def legStats(ms: Seq[Long]): String = {
      val steady = if (ms.size > 1) ms.drop(1) else ms
      s"""{"batches":${ms.size},"max_batch_ms":${ms.max},""" +
        s""""p99_batch_ms":${Stats.percentileMs(ms, 0.99)},""" +
        s""""median_batch_ms":${Stats.medianMs(ms)},""" +
        s""""first_batch_ms":${ms.head},""" +
        s""""p99_steady_batch_ms":${Stats.percentileMs(steady, 0.99)},""" +
        s""""median_steady_batch_ms":${Stats.medianMs(steady)},""" +
        s""""all_ms":${ms.mkString("[", ",", "]")}}"""
    }
    val legs = provs.map { p =>
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        ProviderClass(p))
      p -> graft.queries.StreamingQueries.latencyProbe(spark, sfDir, batches, rows)
    }
    val lead = legs.head._2
    // An empty run (LAT_BATCHES=0, or a drain that yielded only no-data
    // triggers) must emit an explicit error object, not crash the
    // attestation tool with an opaque max-of-empty exception.
    if (legs.exists(_._2.isEmpty))
      println(s"""{"latency":{"error":"no measured batches","batches":0,"rows_per_batch":$rows}}""")
    else {
      // Shared order-statistic definitions with Bench/StreamScale
      // (ADVICE r13): interpolating median, nearest-rank p99 — see [[Stats]].
      println(s"""{"latency":{"pipeline":"s01-shaped","stateful":false,""" +
        s""""batches":${lead.size},"rows_per_batch":$rows,""" +
        s""""max_batch_ms":${lead.max},"p99_batch_ms":${Stats.percentileMs(lead, 0.99)},""" +
        s""""median_batch_ms":${Stats.medianMs(lead)},""" +
        s""""p99_steady_batch_ms":${Stats.percentileMs(
          if (lead.size > 1) lead.drop(1) else lead, 0.99)},"bound_ms":1000,""" +
        s""""legs":${legs.map { case (p, ms) => s""""$p":${legStats(ms)}""" }
          .mkString("{", ",", "}")}}}""")
    }
    spark.stop()
  }
}
