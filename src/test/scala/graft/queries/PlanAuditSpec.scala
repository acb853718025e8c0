package graft.queries

import graft.SparkSpec

/** Registry-wide physical-plan audit: no accidental cartesian products or
  * nested-loop joins anywhere in the batch query surface. e01 is the single
  * allowed exception (an intentional broadcast corpus × 8-query cross join,
  * superseded by e02's bucketed plan at scale) — and e18's exact-recall leg
  * is the same brute-force shape bounded at a CONSTANT MonitorQ-point
  * broadcast sample (the recall monitor is DEFINED against exact truth;
  * since r12 its total work is MonitorQ·n — linear — with the top-5 cut
  * done by a map-side bounded aggregator, not a corpus-wide window), so it
  * keeps the allowance. Streaming-harness queries execute streams on
  * construction, so they are audited by their own e2e specs instead.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("no CartesianProduct or BroadcastNestedLoopJoin in any batch plan") {
    // e19 inherits e18's allowance: its exact leg is the same
    // constant-sample bounded broadcast cross join. e20 is e19's aggregate
    // alert row — the identical plan plus one constant-sized aggregation.
    val allowedCross = Set("e01_cosine_knn", "e18_recall_eval",
      "e19_maintained_recall", "e20_recall_alert")
    // s\d\d queries drive real streaming drains on construction — their
    // returned DataFrame is a sort over a sink, so "auditing" them just
    // re-runs the stream; their plans are covered by the streaming specs.
    val batchQueries = graft.SparkEntry.registry
      .filterNot(q => q.name.matches("s\\d\\d_.*") || q.name.startsWith("k0"))
    assert(batchQueries.size >= 35)
    val offenders = batchQueries.flatMap { q =>
      val plan = q.run(spark, dir).queryExecution.executedPlan.toString
      val bad = !allowedCross(q.name) &&
        (plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin"))
      if (bad) Some(q.name) else None
    }
    assert(offenders.isEmpty, s"plans with cartesian/nested-loop joins: $offenders")
  }
}
