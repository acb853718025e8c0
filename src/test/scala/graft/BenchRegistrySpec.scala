package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench's pre-build list to the live registry: the pre-build loop
  * guards with `if names.contains(n)`, so a renamed query would SILENTLY
  * stop being pre-built and its medians/scaling cells would re-absorb the
  * index-build cost — a methodology drift no other check would surface.
  * No SparkSession needed: this is pure name arithmetic.
  */
class BenchRegistrySpec extends AnyFunSuite {

  test("every Bench pre-build name is a registered query") {
    val registered = SparkEntry.queries.keySet
    val missing = Bench.IndexPrebuild.filterNot(registered)
    assert(missing.isEmpty,
      s"Bench.IndexPrebuild names not in the registry (renamed?): $missing")
  }

  test("every BuildDeps consumer and owner is registered; owners pre-build") {
    val registered = SparkEntry.queries.keySet
    val badKeys = Bench.BuildDeps.keys.filterNot(registered)
    assert(badKeys.isEmpty, s"BuildDeps consumers not in registry: $badKeys")
    val badVals = Bench.BuildDeps.values.flatten.filterNot(registered)
    assert(badVals.isEmpty, s"BuildDeps owners not in registry: $badVals")
    // An owner that is not in IndexPrebuild would never be pre-run, making
    // the dependency edge a no-op.
    val unowned = Bench.BuildDeps.values.flatten.toSet -- Bench.IndexPrebuild.toSet
    assert(unowned.isEmpty, s"BuildDeps owners missing from IndexPrebuild: $unowned")
    // The closure does what ADVICE r11 asked: selecting only a consumer
    // still pre-builds its owner.
    assert(Bench.prebuildFor(Seq("e06_ann_rerank")) == Seq("e04_ann_int8"))
    assert(Bench.prebuildFor(Seq("e18_recall_eval")) == Seq("e05_ann_ivf_trained"))
    assert(Bench.prebuildFor(Seq("q01_pricing_summary")).isEmpty)
  }

  test("pre-build names are unique and every registry name has an oracle") {
    assert(Bench.IndexPrebuild.distinct.size == Bench.IndexPrebuild.size)
    // The driver's gate needs BOTH a queries entry and an oracleSql entry;
    // a registry row without an oracle silently downgrades to a rows-only
    // check. K6-class debug sinks are exempt by design — there are none
    // registered today, so the sets must match exactly.
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet,
      s"queries without oracle: ${SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet}; " +
        s"oracles without query: ${SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet}")
  }
}
