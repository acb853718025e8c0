package graft

import org.apache.spark.sql.SparkSession

/** Standalone streaming-latency attestation: drives the s01-shaped flagship
  * pipeline at a configurable arrival rate and prints per-batch processing
  * times — the operational check behind Bench's `latency` block, runnable
  * on its own so a rate change can be measured without a full bench pass.
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_LAT_BATCHES (default 20),
  * SPARK_GRAFT_LAT_ROWS (default 10000). */
object Latency {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val batches = sys.env.getOrElse("SPARK_GRAFT_LAT_BATCHES", "20").toInt
    val rows = sys.env.getOrElse("SPARK_GRAFT_LAT_ROWS", "10000").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ms = graft.queries.StreamingQueries.latencyProbe(spark, sfDir, batches, rows)
    // An empty run (LAT_BATCHES=0, or a drain that yielded only no-data
    // triggers) must emit an explicit error object, not crash the
    // attestation tool with an opaque max-of-empty exception.
    if (ms.isEmpty)
      println(s"""{"latency":{"error":"no measured batches","batches":0,"rows_per_batch":$rows}}""")
    else {
      // Shared order-statistic definitions with Bench/StreamScale
      // (ADVICE r13): interpolating median, nearest-rank p99 — see [[Stats]].
      println(s"""{"latency":{"pipeline":"s01-shaped","batches":${ms.size},"rows_per_batch":$rows,"max_batch_ms":${ms.max},"p99_batch_ms":${Stats.percentileMs(ms, 0.99)},"median_batch_ms":${Stats.medianMs(ms)},"bound_ms":1000,"all_ms":${ms.mkString("[", ",", "]")}}}""")
    }
    spark.stop()
  }
}
