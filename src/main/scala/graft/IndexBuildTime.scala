package graft

import org.apache.spark.sql.SparkSession

/** Times the ANN graph-index BUILD cold (VERDICT r13 next #6): the bench
  * pre-builds index structures untimed so query cells measure the probe
  * path, which means e07's O(n^1.25) coarse-assignment term — the engine's
  * acknowledged residual — never appears in a committed number. This main
  * rebuilds the materialized graph tables from scratch `reps` times
  * (dropping the memo between runs) and reports the series + median, so a
  * kernel change to the assignment router has a measured before/after.
  *
  * Env: SPARK_GRAFT_SF_DIR (default derived/x100 — the factor-100 corpus),
  * SPARK_GRAFT_REPS (default 3), SPARK_GRAFT_IBT_OUT (default
  * index_build_x100.json), SPARK_GRAFT_CPUS. */
object IndexBuildTime {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "derived/x100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Self-ensure the derived corpus (idempotent via ScaleUp's marker) so
    // the main is runnable standalone; only dirs under derived/ are ever
    // written — a testdata path is used as-is.
    if (dir.startsWith("derived/")) {
      val src = sys.env.getOrElse("SPARK_GRAFT_SCALEUP_SRC", "/root/testdata/sf0.1")
      val factor = sys.env.getOrElse("SPARK_GRAFT_SCALEUP_FACTOR", "100").toInt
      ScaleUp.ensure(spark, src, dir, factor)
    }
    // One untimed warmup build: JVM/codegen/parquet-footer warmth, same
    // discipline as Bench.
    graft.queries.SimilarityQueries.timeGraphBuild(spark, dir)
    val times = (1 to reps).map(_ =>
      graft.queries.SimilarityQueries.timeGraphBuild(spark, dir))
    val json =
      s"""{"index_build":{"dir":"$dir","reps":$reps,""" +
        s""""all_sec":${times.map(t => "%.2f".format(t)).mkString("[", ",", "]")},""" +
        s""""median_sec":${"%.2f".format(Stats.median(times))}}}"""
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_IBT_OUT", "index_build_x100.json")
    val wrote = ArtifactOut.write(out, json)
    spark.stop()
    if (!wrote) sys.exit(2)
  }
}
