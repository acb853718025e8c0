package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Measured attribution for the two ~20× x100 slopes (VERDICT r14 next #5):
  * `bench_x100.json`'s median wall slope is 3.4× for 100× data, but
  * e03 (20.2×) and q40 (19.8×) sit ~6× above it while being argued-linear
  * shapes. This main times CUMULATIVE CUTS of each pipeline at the primary
  * SF and the factor-100 corpus, so the extra wall is attributed to a
  * specific stage instead of a guess:
  *
  *  - e03 cuts: `scan` (projected embedding scan), `exprs` (scan + the
  *    quantization/hash/MAE expression work, no sort), `full` (registered
  *    shape, trailing global orderBy). The orderBy's range partitioner
  *    SAMPLES its child — re-evaluating the expensive array expressions for
  *    the sampled rows — then shuffles and sorts; full − exprs is that
  *    whole share.
  *  - q40 cuts: `scan` (projected orders scan), `window` (the five rank
  *    functions over the shared window sort, no final re-sort), `full`
  *    (registered shape, trailing orderBy(o_orderkey)). The window's
  *    partition key has FIVE distinct values, so the window sort runs at
  *    parallelism ≤ 5 whatever the shuffle-partition count — window − scan
  *    at x100 measures that serialization; full − window is the global
  *    re-sort + its child re-sample.
  *  - q26 cuts (VERDICT r15 next #3): `scan` (interval projection), `join`
  *    (probes-distinct + bucketed range join), `agg` (+ per-month count),
  *    `full` (registered shape, trailing 84-row orderBy) — separates the
  *    join's shuffle/skew share from the rollup and the presentation sort.
  *
  * Each cut is a noop-sink write (Bench's action), one untimed warmup then
  * `reps` timed, medians reported. Writes `slope_attribution.json`.
  *
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  * SPARK_GRAFT_X100_DIR (default derived/x100 — self-ensured),
  * SPARK_GRAFT_REPS (default 3), SPARK_GRAFT_SA_OUT, SPARK_GRAFT_CPUS. */
object SlopeAttribution {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val xDir = sys.env.getOrElse("SPARK_GRAFT_X100_DIR", "derived/x100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
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
    if (ScaleUp.isDerivedDir(xDir)) {
      val src = sys.env.getOrElse("SPARK_GRAFT_SCALEUP_SRC", sfDir)
      val factor = sys.env.getOrElse("SPARK_GRAFT_SCALEUP_FACTOR", "100").toInt
      ScaleUp.ensure(spark, src, xDir, factor)
    }

    def time(mk: => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def series(mk: => DataFrame): Double = {
      time(mk) // untimed warmup (codegen, parquet footers)
      Stats.median((1 to reps).map(_ => time(mk)))
    }

    val cuts: Seq[(String, String, (SparkSession, String) => DataFrame)] = Seq(
      ("e03", "scan", (s, d) => graft.sources.Tables.load(s, d, "embeddings")
        .select(org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.transform(
            org.apache.spark.sql.functions.col("embedding"),
            x => x.cast("double")).as("ve"))),
      ("e03", "exprs", (s, d) =>
        graft.queries.SimilarityQueries.e03Frame(s, d, sorted = false)),
      ("e03", "full", (s, d) =>
        graft.queries.SimilarityQueries.e03Frame(s, d)),
      ("q40", "scan", (s, d) =>
        graft.queries.RelationalQueries.q40Frame(s, d, "scan")),
      ("q40", "window", (s, d) =>
        graft.queries.RelationalQueries.q40Frame(s, d, "window")),
      ("q40", "full", (s, d) =>
        graft.queries.RelationalQueries.q40Frame(s, d, "full")),
      ("q26", "scan", (s, d) =>
        graft.queries.RelationalQueries.q26Frame(s, d, "scan")),
      ("q26", "join", (s, d) =>
        graft.queries.RelationalQueries.q26Frame(s, d, "join")),
      ("q26", "agg", (s, d) =>
        graft.queries.RelationalQueries.q26Frame(s, d, "agg")),
      ("q26", "full", (s, d) =>
        graft.queries.RelationalQueries.q26Frame(s, d, "full")))

    val dirs = Seq("sf" -> sfDir, "x100" -> xDir)
    val rows = for ((q, cut, mk) <- cuts; (dtag, d) <- dirs) yield {
      val sec = series(mk(spark, d))
      println(s"$q/$cut @ $dtag: ${"%.2f".format(sec)} s")
      (q, cut, dtag, sec)
    }
    def secOf(q: String, cut: String, dtag: String): Double =
      rows.collectFirst { case (`q`, `cut`, `dtag`, s) => s }.get
    val qJson = Seq("e03" -> Seq("scan", "exprs", "full"),
      "q40" -> Seq("scan", "window", "full"),
      "q26" -> Seq("scan", "join", "agg", "full")).map { case (q, cs) =>
      val cells = cs.map { c =>
        val a = secOf(q, c, "sf"); val b = secOf(q, c, "x100")
        s""""$c":{"sf_sec":${"%.2f".format(a)},"x100_sec":${"%.2f".format(b)},""" +
          s""""slope":${"%.1f".format(if (a > 0) b / a else 0.0)}}"""
      }.mkString(",")
      // The stage deltas at x100 — the attribution itself.
      val steps = cs.sliding(2).map { case Seq(lo, hi) =>
        s""""${hi}_minus_${lo}_x100_sec":${
          "%.2f".format(secOf(q, hi, "x100") - secOf(q, lo, "x100"))}"""
      }.mkString(",")
      s""""$q":{$cells,$steps}"""
    }.mkString(",")
    val json = s"""{"slope_attribution":{"reps":$reps,"sf_dir":"$sfDir","x100_dir":"$xDir",$qJson}}"""
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_SA_OUT", "slope_attribution.json")
    val wrote = ArtifactOut.write(out, json)
    spark.stop()
    if (!wrote) sys.exit(2)
  }
}
