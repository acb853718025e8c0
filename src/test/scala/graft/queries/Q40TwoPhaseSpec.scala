package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q40's two-phase rank family (optimization r17): the direct
  * `Window.partitionBy(o_orderpriority)` caps the query at 5-way
  * parallelism at every scale, so [[RelationalQueries.q40Frame]] computes
  * rank/dense_rank/percent_rank/cume_dist/ntile from the row's POSITION in
  * a range-partitioned order plus broadcast per-partition offsets. The
  * rewrite's correctness rests on one invariant and one identity:
  *
  *  - (o_totalprice, o_orderkey) is UNIQUE per priority (o_orderkey is the
  *    orders PK) — so rank = dense_rank = row position, no tie groups;
  *  - every window value is then a pure function of (position, group
  *    count): percent_rank = (pos−1)/(n−1), cume_dist = pos/n, ntile(4) =
  *    the tile containing pos with larger tiles first.
  *
  * These tests pin (1) the PK invariant on the fixture, (2) row-for-row
  * BITWISE equality (incl. the two double divisions) against the original
  * direct-window formulation kept as [[RelationalQueries.q40DirectFrame]],
  * and (3) the ntile/percent_rank edge cases (group sizes 1, 2, 3, 4, 5, 7
  * — n < tiles, n = tiles, n % 4 ≠ 0, the n = 1 zero-division guard) on a
  * synthetic orders table the fixture's uniform priorities cannot cover. */
class Q40TwoPhaseSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map { r =>
      // Render doubles via exact bit pattern so a ULP divergence between
      // the two formulations cannot hide behind decimal printing.
      (0 until r.length).map { i =>
        r.get(i) match {
          case d: java.lang.Double =>
            java.lang.Double.doubleToLongBits(d).toString
          case v => String.valueOf(v)
        }
      }.mkString("|")
    }.toSeq

  test("o_orderkey is unique — the invariant the two-phase rewrite rests on") {
    val orders = graft.sources.Tables.load(spark, dir, "orders")
    assert(orders.groupBy(col("o_orderkey")).count()
      .filter(col("count") > 1).limit(1).count() == 0,
      "duplicate o_orderkey: rank != row position and q40Frame is wrong")
  }

  test("two-phase q40 equals the direct window formulation bit-for-bit") {
    val direct = rows(RelationalQueries.q40DirectFrame(spark, dir))
    val twoPhase = rows(RelationalQueries.q40Frame(spark, dir))
    assert(direct.nonEmpty, "vacuous: empty orders fixture")
    assert(twoPhase == direct,
      s"two-phase diverged: two-phase-only=${twoPhase.diff(direct).take(3)} " +
        s"direct-only=${direct.diff(twoPhase).take(3)}")
  }

  test("the range partitioning is evaluated ONCE (persisted fork) — load-bearing") {
    // The offsets branch and the row_number branch both consume the same
    // range-partitioned subtree, and range boundaries are SAMPLED per
    // exchange execution (RangePartitioner seeds by RDD id): two
    // independent executions could assign different _pids and attach the
    // broadcast offsets to the wrong partitions. Exchange reuse measurably
    // did NOT dedup the fork here, so q40Frame persists the stamped frame
    // (an InMemoryRelation is the one DataFrame-level DAG-sharing
    // primitive). This test pins the mechanism: both branches must read
    // the cache, and no second bare range exchange over the priority
    // triple may survive in the executed plan.
    val df = RelationalQueries.q40Frame(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    // BOTH branches must read the cache (each InMemoryTableScan re-prints
    // the cached plan with fresh display ids, so counting exchanges in the
    // string over-counts — the shared CachedRDDBuilder is what guarantees
    // one evaluation, and q40Frame registers exactly one entry per run).
    val nCacheReads = "InMemoryTableScan".r.findAllMatchIn(plan).size
    assert(nCacheReads >= 2,
      s"two-phase q40's fork is not cache-shared (cache reads=$nCacheReads) " +
        s"— _pid consistency not guaranteed:\n$plan")
  }

  test("multi-partition consistency: 200k-row synthetic frame, forced fan-out") {
    // sf0.001/sf0.01 collapse to one shuffle partition under AQE, which
    // would hide a boundary mismatch between the two branches; this frame
    // is big enough that the range exchange genuinely fans out, so the
    // bitwise comparison has teeth at partition boundaries.
    import spark.implicits._
    val tmp = graft.streaming.StreamHarness.tempDir("q40-big")
    (1L to 200000L).toDF("o_orderkey")
      .selectExpr("o_orderkey",
        "concat('p', CAST(o_orderkey % 5 AS STRING)) AS o_orderpriority",
        // Heavy price collisions on purpose: boundary rows tie on price and
        // are split across partitions by the key tiebreak.
        "CAST(o_orderkey % 1000 AS DOUBLE) AS o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val direct = rows(RelationalQueries.q40DirectFrame(spark, tmp))
    val twoPhase = rows(RelationalQueries.q40Frame(spark, tmp))
    assert(direct.size == 200000)
    assert(twoPhase == direct,
      s"two-phase diverged on the fan-out frame: " +
        s"two-phase-only=${twoPhase.diff(direct).take(3)} " +
        s"direct-only=${direct.diff(twoPhase).take(3)}")
  }

  test("ntile/percent_rank edges: group sizes 1,2,3,4,5,7 match the window form") {
    import spark.implicits._
    val tmp = graft.streaming.StreamHarness.tempDir("q40-edge")
    // Priority pN has exactly N rows; keys globally unique; prices collide
    // across groups on purpose (the partition key isolates them).
    val rows0 = Seq(1, 2, 3, 4, 5, 7).flatMap { n =>
      (1 to n).map(k => (n * 100L + k, s"p$n", (k % 3).toDouble))
    }
    rows0.toDF("o_orderkey", "o_orderpriority", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val direct = rows(RelationalQueries.q40DirectFrame(spark, tmp))
    val twoPhase = rows(RelationalQueries.q40Frame(spark, tmp))
    assert(direct.size == rows0.size)
    assert(twoPhase == direct,
      s"edge groups diverged: two-phase-only=${twoPhase.diff(direct).take(5)} " +
        s"direct-only=${direct.diff(twoPhase).take(5)}")
  }
}
