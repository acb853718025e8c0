package graft.operators

import graft.SparkSpec

/** Min-label propagation must find full components, not just direct
  * neighborhoods: a chain a—b—c—d collapses to one cluster even though the
  * endpoints never share an edge (the property pairwise dedup lacks). */
class ConnectedComponentsSpec extends SparkSpec {

  private def run(nodes: Seq[Long], undirected: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    val n = nodes.toDF("id")
    val e0 = undirected.toDF("src", "dst")
    val e = e0.union(e0.select($"dst", $"src"))
    ConnectedComponents.label(n, e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain merges transitively across multiple hops") {
    // 1—2—3—4 is diameter 3: needs >1 propagation round to converge.
    val got = run(Seq(1L, 2L, 3L, 4L), Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("disjoint components keep distinct min labels; singletons self-label") {
    val got = run(
      Seq(10L, 11L, 20L, 21L, 22L, 30L),
      Seq((10L, 11L), (21L, 20L), (21L, 22L)))
    assert(got == Map(10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L,
      22L -> 20L, 30L -> 30L))
  }

  test("cycle converges (fixpoint, not infinite closure)") {
    val got = run(Seq(5L, 6L, 7L), Seq((5L, 6L), (6L, 7L), (7L, 5L)))
    assert(got == Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("edgeless graph converges immediately") {
    val got = run(Seq(1L, 2L), Seq.empty)
    assert(got == Map(1L -> 1L, 2L -> 2L))
  }

  test("long chain converges in O(log diameter) rounds (pointer jumping)") {
    // A 200-node path has diameter 199: plain propagation needs 199 rounds,
    // far past maxIter = 16. Pointer jumping halves label distance each
    // round (~log2(199) ≈ 8), so this converges — and to the right labels.
    val s = spark
    import s.implicits._
    val ids = (1L to 200L)
    val n = ids.toDF("id")
    val e0 = ids.init.map(i => (i, i + 1)).toDF("src", "dst")
    val e = e0.union(e0.select($"dst", $"src"))
    val got = ConnectedComponents.label(n, e, maxIter = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ids.map(_ -> 1L).toMap)
  }
}
