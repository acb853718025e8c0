package graft.queries

import graft.SparkSpec

/** ADVICE r11 follow-through: the IVF postings cache memoizes LIVE persisted
  * DataFrames, which are bound to the owning session's block manager — so
  * its key now includes the session, unlike the path-keyed graph/label
  * caches that any session can re-read. This spec pins the repaired
  * behavior end-to-end: a SECOND SparkSession in the same JVM (fresh
  * sessionState, fresh function registry, shared block manager) must build
  * and serve its own postings — not be handed another session's frame —
  * and produce bit-identical results.
  */
class SecondSessionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("a second SparkSession rebuilds session-bound postings and matches") {
    val first = SimilarityQueries.e02AnnIvf.run(spark, dir).collect()
    val s2 = spark.newSession()
    val second = SimilarityQueries.e02AnnIvf.run(s2, dir).collect()
    assert(first.length == second.length && first.length > 0)
    first.zip(second).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"row $i differs across sessions: $a vs $b")
    }
  }
}
