package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketing must be invisible: the bucketed range join equals the naive
  * theta join, including intervals spanning month boundaries. */
class RangeJoinSpec extends SparkSpec {

  test("bucketed point-in-interval equals the naive theta join") {
    import spark.implicits._
    val intervals = Seq(
      ("2024-01-05", "2024-01-20", "a"),   // inside one month
      ("2024-01-25", "2024-03-02", "b"),   // spans two month boundaries
      ("2024-02-01", "2024-02-01", "c"))   // single-day
      .toDF("sd_s", "ed_s", "tag")
      .select(to_date(col("sd_s")).as("sd"), to_date(col("ed_s")).as("ed"), col("tag"))
    val points = Seq("2024-01-01", "2024-01-10", "2024-02-01", "2024-03-01", "2024-03-05")
      .toDF("d_s").select(to_date(col("d_s")).as("d"))

    val naive = points.crossJoin(intervals)
      .filter(col("sd") <= col("d") && col("d") <= col("ed"))
      .select("d", "tag").orderBy("d", "tag")
      .collect().map(r => (r.getDate(0).toString, r.getString(1))).toSeq
    val bucketed = RangeJoin.pointInInterval(points, "d", intervals, "sd", "ed")
      .select("d", "tag").orderBy("d", "tag")
      .collect().map(r => (r.getDate(0).toString, r.getString(1))).toSeq
    assert(bucketed == naive)
    assert(naive == Seq(("2024-01-10", "a"), ("2024-02-01", "b"),
      ("2024-02-01", "c"), ("2024-03-01", "b")))
  }

  test("the bucketed plan joins on an equi-key, not a nested loop") {
    import spark.implicits._
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val intervals = (1 to 100).map(i => (s"2024-01-${i % 28 + 1}", i))
        .toDF("s", "id")
        .select(to_date(col("s")).as("sd"), to_date(col("s")).as("ed"), col("id"))
      val points = Seq("2024-01-10").toDF("p").select(to_date(col("p")).as("d"))
      val plan = RangeJoin.pointInInterval(points, "d", intervals, "sd", "ed")
        .queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
