package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Skew-planted scale point for the salted join (VERDICT r13 next #7): q24
  * proves [[graft.operators.SaltedJoin]] result-equal, but nothing measured
  * the claim it exists for — that under a planted hot key the salted plan
  * stays flat where the naive shuffle join melts one reducer. This main
  * joins the x100 events table (q24's exact skew shape: 80% of rows
  * collapse onto key 0, the rest spread over 16 keys) to the nation-derived
  * dimension three ways, interleaved round-robin, medians of
  * SPARK_GRAFT_REPS:
  *
  *  - `naive`: plain shuffle join with AQE and broadcast DISABLED — the
  *    regime the salted join targets (a dimension too big to broadcast, a
  *    plan AQE cannot re-split; at 100 TB both happen). The hot key's rows
  *    land on ONE reducer.
  *  - `salted`: [[graft.operators.SaltedJoin]] with q24's salt=8, same
  *    AQE/broadcast-off settings — the hot key spreads over 8 reducers.
  *  - `aqe_skew`: plain join with AQE skew-join ON and broadcast still off —
  *    the runtime alternative, for context.
  *
  * Inputs are persisted and counted before timing, so reps time the join +
  * aggregate, not the parquet scan. The artifact records the measured hot
  * fraction so the skew ratio is documented, not assumed.
  *
  * Env: SPARK_GRAFT_SKEW_DIR (default derived/x100 — build it with
  * [[ScaleUp]] via a bench run if absent), SPARK_GRAFT_REPS (default 3),
  * SPARK_GRAFT_SKEW_OUT (default skew_join_x100.json), SPARK_GRAFT_CPUS. */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SKEW_DIR", "derived/x100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val salt = 8
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

    val e = Tables.load(spark, dir, "events")
      .select(when(col("user_id") % 10 < 8, lit(0L))
        .otherwise(col("user_id") % 17).as("k"), col("value"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dim = Tables.load(spark, dir, "nation")
      .groupBy((col("n_nationkey") % 17).cast("long").as("k"))
      .agg(min_by(col("n_name"), col("n_nationkey")).as("n_name"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = e.count()
    val hot = e.filter(col("k") === 0L).count()
    dim.count()

    def agg(joined: DataFrame): DataFrame = joined
      .groupBy(col("k"), col("n_name"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

    def withConf[T](kvs: (String, String)*)(body: => T): T = {
      val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally prev.foreach { case (k, p) =>
        p.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
    }
    val noAqeNoBcast = Seq(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val aqeSkew = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")

    def time(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val variants: Seq[(String, () => Double)] = Seq(
      "naive" -> (() => withConf(noAqeNoBcast: _*) {
        time(agg(e.join(dim, "k")))
      }),
      "salted" -> (() => withConf(noAqeNoBcast: _*) {
        time(agg(graft.operators.SaltedJoin(e, dim, "k", salt)))
      }),
      "aqe_skew" -> (() => withConf(aqeSkew: _*) {
        time(agg(e.join(dim, "k")))
      }))

    // Warmup (codegen + page cache) then interleaved reps, same discipline
    // as Bench.
    variants.foreach { case (_, f) => f() }
    val series = (1 to reps).map(_ => variants.map { case (n, f) => n -> f() })
    val med = variants.map { case (n, _) =>
      n -> Stats.median(series.map(_.find(_._1 == n).get._2))
    }
    val medMap = med.toMap
    val json =
      s"""{"skew_join":{"dir":"$dir","rows":$total,"hot_rows":$hot,""" +
        s""""hot_frac":${"%.4f".format(hot.toDouble / total)},"distinct_keys":17,"salt":$salt,""" +
        s""""shuffle_partitions":$cpus,"reps":$reps,""" +
        med.map { case (n, v) => s""""${n}_sec":${"%.3f".format(v)}""" }.mkString(",") + "," +
        s""""naive_over_salted":${"%.2f".format(medMap("naive") / medMap("salted"))},""" +
        s""""all":${series.map(r => r.map(_._2).map(v => "%.3f".format(v))
          .mkString("[", ",", "]")).mkString("[", ",", "]")}}}"""
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_SKEW_OUT", "skew_join_x100.json")
    val wrote = ArtifactOut.write(out, json)
    spark.stop()
    if (!wrote) sys.exit(2)
  }
}
