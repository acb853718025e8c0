package graft

import org.apache.spark.sql.SparkSession

/** Times the ANN graph-index BUILD cold (VERDICT r13 next #6, r14 next #3):
  * the bench pre-builds index structures untimed so query cells measure the
  * probe path, which means e07's O(n^1.25) coarse-assignment term — the
  * engine's acknowledged residual — never appears in a committed number.
  * This main rebuilds the materialized graph tables from scratch `reps`
  * times (dropping the memo between runs) and reports, per rep, the total
  * AND the three phases [[graft.queries.SimilarityQueries.BuildPhases]]
  * splits the build into — `prepare` (scan+norm+persist+seed collect),
  * `train` (the Lloyd loop), `assign_write` (the fused corpus-routing +
  * probe-join + NN-descent + parquet-write job) — so a kernel change to
  * the assignment router has a measured before/after that training and
  * write costs no longer dilute.
  *
  * The warmup build is REPORTED (labeled, excluded from the median): r14's
  * rep spread (312.8/158.8/172.8 s) was page-cache/contention warmth, and
  * an unlabeled cold rep either poisons the median or vanishes silently.
  * On top of the per-rep phases, three ISOLATED assignment legs
  * ([[graft.queries.SimilarityQueries.timeAssignLeg]]) run the corpus
  * routing standalone — scan-only floor, float router, int8 router — the
  * direct kernel A/B the r13→r14 `index_build_x100_before/after` pair
  * could only infer end-to-end.
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
      // Scan-parallelism floor derived from core count (Bench's rationale).
      .config("spark.sql.files.minPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_MIN_SPLITS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Self-ensure the derived corpus (idempotent via ScaleUp's marker) so
    // the main is runnable standalone; only dirs with a derived/ segment
    // (relative or absolute spelling) are ever written — a testdata path
    // is used as-is.
    if (ScaleUp.isDerivedDir(dir)) {
      val src = sys.env.getOrElse("SPARK_GRAFT_SCALEUP_SRC", "/root/testdata/sf0.1")
      val factor = sys.env.getOrElse("SPARK_GRAFT_SCALEUP_FACTOR", "100").toInt
      ScaleUp.ensure(spark, src, dir, factor)
    }
    import graft.queries.SimilarityQueries
    val phaseNames = Seq("prepare", "train", "assign_write")

    def phasesJson(ph: Map[String, Double]): String =
      phaseNames.map(p => s""""${p}_sec":${"%.2f".format(ph.getOrElse(p, 0.0))}""")
        .mkString(",")

    // Warmup build: JVM/codegen/parquet-footer + page-cache warmth, same
    // discipline as Bench — REPORTED (labeled cold) but outside the median.
    val warm = SimilarityQueries.timeGraphBuild(spark, dir)
    val warmPhases = SimilarityQueries.BuildPhases.snapshot
    val repRows = (1 to reps).map { _ =>
      val t = SimilarityQueries.timeGraphBuild(spark, dir)
      (t, SimilarityQueries.BuildPhases.snapshot)
    }
    val times = repRows.map(_._1)
    // Isolated assignment legs, one untimed warmup each then `reps` timed:
    // the codebook is in cbCache from the builds above, so each leg is one
    // map-side stage into the noop sink.
    val legNames = Seq("scan", "float", "int8")
    val legs = legNames.map { leg =>
      SimilarityQueries.timeAssignLeg(spark, dir, leg)
      leg -> (1 to reps).map(_ => SimilarityQueries.timeAssignLeg(spark, dir, leg))
    }
    val legsJson = legs.map { case (leg, ts) =>
      s""""$leg":{"all_sec":${ts.map(t => "%.2f".format(t)).mkString("[", ",", "]")},""" +
        s""""median_sec":${"%.2f".format(Stats.median(ts))}}"""
    }.mkString(",")
    // MARGINAL cuts of the fused assign_write stage (VERDICT r15 next #2;
    // semantics updated in r17): since the build materializes its shared
    // candidate table (listPairs persists `canon`/`g3`, the r17 NN-descent
    // fix), the three cuts execute in the shipped order SHARING those
    // caches — cand_join pays the cold candidate stage + cache write,
    // nn_descent then measures ONLY the incremental top-K + hop cost over
    // the warm cache, full_write only the τ-part + parquet write. They are
    // stage MARGINALS, not cumulative prefixes, so the r16 next-#3
    // trustworthiness gate is a per-rep CONSISTENCY check instead of
    // cumulative monotonicity: the marginals must SUM to ≈ the fused
    // stage's independently measured wall (|sum/assign_write − 1| ≤ 0.35 —
    // a contended rep inflates one marginal without inflating the build
    // median it must explain, and is re-run, ≤2 retries). ≥3 reps; per-rep
    // retries and the final consistency verdict are recorded so a
    // still-violating rep is visible, never silently averaged in.
    val cutReps = math.max(3, sys.env.getOrElse("SPARK_GRAFT_CUT_REPS", "3").toInt)
    val cutNames = Seq("cand_join", "nn_descent", "full_write")
    val assignMed = Stats.median(repRows.map(_._2.getOrElse("assign_write", 0.0)))
    def consistent(m: Map[String, Double]): Boolean = {
      val sum = cutNames.map(m).sum
      assignMed > 0 && math.abs(sum / assignMed - 1.0) <= 0.35
    }
    val cutRows = (1 to cutReps).map { _ =>
      var row = SimilarityQueries.timeBuildCuts(spark, dir).toMap
      var retries = 0
      while (!consistent(row) && retries < 2) {
        retries += 1
        row = SimilarityQueries.timeBuildCuts(spark, dir).toMap
      }
      (row, retries, consistent(row))
    }
    val cutsJson = cutNames.map { c =>
      val ts = cutRows.map(_._1(c))
      s""""$c":{"all_sec":${ts.map(t => "%.2f".format(t)).mkString("[", ",", "]")},""" +
        s""""median_sec":${"%.2f".format(Stats.median(ts))}}"""
    }.mkString(",") +
      s""","mode":"marginal","assign_write_median_sec":${"%.2f".format(assignMed)},""" +
      s""""sum_sec":${cutRows.map(r => "%.2f".format(cutNames.map(r._1).sum))
        .mkString("[", ",", "]")},""" +
      s""""retries":${cutRows.map(_._2).mkString("[", ",", "]")},""" +
      s""""consistent":${cutRows.map(_._3).mkString("[", ",", "]")}"""
    val json =
      s"""{"index_build":{"dir":"$dir","reps":$reps,""" +
        s""""warmup_cold":{"total_sec":${"%.2f".format(warm)},${phasesJson(warmPhases)}},""" +
        s""""all_sec":${times.map(t => "%.2f".format(t)).mkString("[", ",", "]")},""" +
        s""""median_sec":${"%.2f".format(Stats.median(times))},""" +
        s""""phases":${repRows.map { case (t, ph) =>
          s"""{"total_sec":${"%.2f".format(t)},${phasesJson(ph)}}"""
        }.mkString("[", ",", "]")},""" +
        s""""assign_isolated":{$legsJson},""" +
        s""""assign_write_cuts":{"reps":$cutReps,$cutsJson}}}"""
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_IBT_OUT", "index_build_x100.json")
    val wrote = ArtifactOut.write(out, json)
    spark.stop()
    if (!wrote) sys.exit(2)
  }
}
