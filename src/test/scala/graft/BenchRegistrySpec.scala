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
