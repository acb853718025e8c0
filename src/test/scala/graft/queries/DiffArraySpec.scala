package graft.queries

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** q50 — the difference-array rewrite of q26's count-only rollup (VERDICT
  * r16 next #4). The rewrite's claim is an algebraic identity: for a month
  * start d, `#{intervals [sd,ed]: sd ≤ d ≤ ed}` equals the running sum of
  * per-interval ±1 deltas at month boundaries. These tests pin the identity
  * against q26's joined formulation on real data — including the edge cases
  * that discriminate a wrong boundary rule:
  *
  *  - `sd` exactly on the 1st (first-month-start(sd) must be sd itself, not
  *    the NEXT month — `trunc(sd)` alone would under-count those months);
  *  - intervals spanning no month start (their +1/−1 land on the same month
  *    and must cancel exactly);
  *  - probe months no interval covers (q26's inner join emits no row; q50's
  *    n ≥ 1 filter must reproduce the omission).
  *
  * The sf0.001 lineitem table has all three (7 years of ship dates, spans
  * 0–44 days), so exact equality here is a discriminating gate, and the
  * driver's DuckDB oracle re-proves it at sf0.01 against q26's EXACT SQL. */
class DiffArraySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(q: GraftQuery) =
    q.run(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).toSeq

  test("q50 difference array equals q26's joined range-join rollup exactly") {
    val joined = rows(RelationalQueries.q26RangeJoin)
    val diff = rows(RelationalQueries.q50OpenIntervalsDiff)
    assert(joined.nonEmpty, "vacuous: q26 returned no months")
    assert(diff == joined,
      s"difference-array diverged from the joined rollup: " +
        s"diff-only=${diff.diff(joined).take(3)} joined-only=${joined.diff(diff).take(3)}")
    // The edge cases are actually present in the data, so the equality
    // above discriminated them: some ship date falls on the 1st, and some
    // interval spans no month start (sd's month == ed's month, sd > 1st).
    import org.apache.spark.sql.functions.{dayofmonth, to_date, date_add, trunc}
    val iv = graft.sources.Tables.load(spark, dir, "lineitem").select(
      to_date(col("l_shipdate")).as("sd"),
      date_add(to_date(col("l_shipdate")),
        (col("l_orderkey") % 45).cast("int")).as("ed"))
    assert(iv.filter(dayofmonth(col("sd")) === 1).limit(1).count() == 1,
      "no first-of-month ship date in the fixture — boundary case untested")
    assert(iv.filter(trunc(col("sd"), "month") === trunc(col("ed"), "month") &&
      dayofmonth(col("sd")) =!= 1).limit(1).count() == 1,
      "no within-month interval in the fixture — cancellation case untested")
  }

  test("q50's plan never joins row-scaled data — deltas aggregate map-side") {
    val plan = RelationalQueries.q50OpenIntervalsDiff.run(spark, dir)
      .queryExecution.executedPlan.toString
    // The only join is the bounded-month semi-join; the lineitem scan must
    // feed an aggregate directly (partial map-side rollup), never a join —
    // that is the whole point of the rewrite vs q26's range join.
    assert(!plan.contains("SortMergeJoin"),
      s"q50 plan contains a sort-merge join (row-scaled shuffle):\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q50 plan contains a cartesian/nested-loop join:\n$plan")
  }
}
