package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native as-of join: value parity with the (a)-path compose
  * [[graft.operators.AsOfJoin]], physical-plan shape, inner conversion,
  * and both registration paths. */
class AsOfJoinPlanSpec extends SparkSpec {

  private def clicks = {
    import spark.implicits._
    Seq(("u1", 10L, "c1"), ("u1", 25L, "c2"), ("u2", 5L, "c3"))
      .toDF("k", "t", "cid")
  }
  private def purchases = {
    import spark.implicits._
    Seq(("u1", 10L, 100L, 1.0), ("u1", 20L, 101L, 2.0), ("u2", 9L, 102L, 3.0))
      .toDF("pk", "pt", "pid", "pv")
  }

  private def native: DataFrame =
    GraftPlans.asOf(clicks, purchases, "k", "t", "pk", "pt", Some("pid"))
      .select(col("cid"), col("pid"), col("pv"))

  /** Plan-shape assertions run with AQE off: the adaptive final plan hides
    * the operator tree behind QueryStage leaves (`ResultQueryStage`), so the
    * static plan is the one whose shape is meaningful to assert. Execution
    * correctness is still covered under default AQE by the value tests. */
  private def staticPlan(df: => DataFrame): SparkPlan = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    try { spark.conf.set(key, "false"); df.queryExecution.executedPlan }
    finally spark.conf.set(key, prev)
  }

  test("each left row gets the latest right row at or before its time") {
    val got = native.orderBy("cid").collect()
      .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)))).toSeq
    assert(got == Seq(
      ("c1", Some(100L), Some(1.0)), // update at exactly t=10 IS visible
      ("c2", Some(101L), Some(2.0)), // latest of the two prior updates
      ("c3", None, None)))           // u2's purchase at t=9 is after t=5
  }

  test("ties at equal time resolve to the max tiebreak value") {
    import spark.implicits._
    val c = Seq(("u1", 10L, "c1")).toDF("k", "t", "cid")
    val p = Seq(("u1", 10L, 7L, 1.0), ("u1", 10L, 9L, 2.0)).toDF("pk", "pt", "pid", "pv")
    val got = GraftPlans.asOf(c, p, "k", "t", "pk", "pt", Some("pid"))
      .select("pid", "pv").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((9L, 2.0)))
  }

  test("matches the union+window compose on a generated corpus") {
    import spark.implicits._
    // Deterministic pseudo-random corpus: many keys, duplicate times, keys
    // with zero right rows, right-only keys.
    val left = (1 to 500).map { i =>
      (s"u${i % 37}", (i * 2654435761L) % 100, s"c$i")
    }.toDF("k", "t", "cid")
    val right = (1 to 300).map { i =>
      (s"u${i % 23}", (i * 40503L) % 100, i.toLong, i / 7.0)
    }.toDF("pk", "pt", "pid", "pv")

    val viaPlan = GraftPlans.asOf(left, right, "k", "t", "pk", "pt", Some("pid"))
      .select(col("cid"), col("pid"), col("pv"))
      .collect().map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)))).toSet

    val viaCompose = graft.operators.AsOfJoin(
      left, right.withColumnRenamed("pk", "k").withColumnRenamed("pt", "t"),
      "k", "t", rightCols = Seq("pid", "pv"), tiebreak = "pid")
      .select(col("cid"), col("pid"), col("pv"))
      .collect().map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)))).toSet

    assert(viaPlan == viaCompose)
  }

  test("plans as AsOfJoinExec with one shuffle per side") {
    val plan = staticPlan(native)
    val asofs = plan.collect { case a: AsOfJoinExec => a }
    assert(asofs.length == 1, s"expected one AsOfJoinExec in:\n$plan")
    assert(asofs.head.emitUnmatched)
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.length == 2, s"expected exactly 2 shuffles in:\n$plan")
  }

  test("a null-rejecting filter above converts to the inner variant and stays correct") {
    val filtered = native.filter(col("pv").isNotNull)
    val got = filtered.orderBy("cid").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq(("c1", 100L, 1.0), ("c2", 101L, 2.0)))
    val plan = staticPlan(native.filter(col("pv").isNotNull))
    val asofs = plan.collect { case a: AsOfJoinExec => a }
    assert(asofs.length == 1, s"expected one AsOfJoinExec in:\n$plan")
    // EliminateOuterJoin sees IsNotNull(pv) and converts LeftOuter → Inner;
    // the rewrite must carry that into emitUnmatched=false.
    assert(!asofs.head.emitUnmatched, "expected the inner (emitUnmatched=false) variant")
  }

  test("null keys and null times on the right never match") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val cSchema = StructType(Seq(StructField("k", StringType), StructField("t", LongType),
      StructField("cid", StringType)))
    val pSchema = StructType(Seq(StructField("pk", StringType), StructField("pt", LongType),
      StructField("pid", LongType), StructField("pv", DoubleType)))
    val c = spark.createDataFrame(
      java.util.Arrays.asList(Row("u1", 10L, "c1"), Row(null, 10L, "c2")), cSchema)
    val p = spark.createDataFrame(
      java.util.Arrays.asList(Row(null, 5L, 1L, 1.0), Row("u1", null, 2L, 2.0)), pSchema)
    val got = GraftPlans.asOf(c, p, "k", "t", "pk", "pt", Some("pid"))
      .select("cid", "pid").orderBy("cid").collect()
      .map(r => (r.getString(0), Option(r.get(1)))).toSeq
    assert(got == Seq(("c1", None), ("c2", None)))
  }

  test("equivalence sweep vs an in-memory reference across seeded corpora") {
    import spark.implicits._
    // Deterministic LCG so the sweep never flakes; three corpora exercise
    // sparse matches, dense duplicate times, and right-heavy keys.
    def lcg(seed: Long): Iterator[Long] =
      Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)
    for (seed <- Seq(7L, 99L, 5151L)) {
      val r = lcg(seed).map(x => math.abs(x))
      val nL = 120 + (r.next() % 80).toInt
      val nR = 90 + (r.next() % 120).toInt
      val leftRows = (1 to nL).map { i =>
        (s"k${r.next() % 19}", (r.next() % 40).toLong, s"L$i")
      }
      val rightRows = (1 to nR).map { i =>
        (s"k${r.next() % 13}", (r.next() % 40).toLong, i.toLong, (r.next() % 1000) / 10.0)
      }
      val expected = leftRows.map { case (k, t, id) =>
        val m = rightRows.filter(rr => rr._1 == k && rr._2 <= t)
        val best = if (m.isEmpty) None else Some(m.maxBy(rr => (rr._2, rr._3)))
        (id, best.map(_._3), best.map(_._4))
      }.toSet
      val got = GraftPlans.asOf(
        leftRows.toDF("k", "t", "cid"), rightRows.toDF("pk", "pt", "pid", "pv"),
        "k", "t", "pk", "pt", Some("pid"))
        .select(col("cid"), col("pid"), col("pv"))
        .collect()
        .map(row => (row.getString(0),
          Option(row.get(1)).map(_.asInstanceOf[Long]),
          Option(row.get(2)).map(_.asInstanceOf[Double]))).toSet
      assert(got == expected, s"seed $seed diverged from the reference")
    }
  }

  test("GraftExtensions installs the rule, strategy, and marker function") {
    val exts = new SparkSessionExtensions
    new GraftExtensions()(exts)
    // build* are private[sql] in source but public in bytecode.
    def built(method: String): Seq[_] = classOf[SparkSessionExtensions]
      .getMethod(method, classOf[org.apache.spark.sql.SparkSession])
      .invoke(exts, spark).asInstanceOf[Seq[_]]
    assert(built("buildOptimizerRules").contains(AsOfJoinRewrite))
    assert(built("buildPlannerStrategies").contains(AsOfJoinStrategy))
  }
}
