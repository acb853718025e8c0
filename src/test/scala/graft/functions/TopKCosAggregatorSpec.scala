package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The bounded top-K aggregator's algebra: reduce/merge must implement
  * top-K under the (score DESC, id ASC) TOTAL order, associatively and
  * commutatively — that is what makes e18's map-side exact leg independent
  * of row order and partitioning, hence oracle-checkable. */
class TopKCosAggregatorSpec extends AnyFunSuite {

  private val agg = new TopKCosAggregator(5)

  private def foldAll(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
    xs.foldLeft(agg.zero)(agg.reduce)

  private val rows: Seq[(Double, Long)] = Seq(
    (0.5, 10L), (0.9, 3L), (0.5, 2L), (0.1, 7L), (0.9, 9L),
    (0.3, 1L), (0.7, 4L), (0.5, 5L), (0.2, 6L), (0.8, 8L))

  private val expected: Seq[(Double, Long)] =
    rows.sortBy { case (c, id) => (-c, id) }.take(5)

  test("sequential reduce yields top-5 by (score DESC, id ASC)") {
    assert(foldAll(rows) == expected)
  }

  test("result is independent of row order (commutative fold)") {
    assert(foldAll(rows.reverse) == expected)
    assert(foldAll(rows.sortBy(_._2)) == expected)
  }

  test("merge of arbitrary partition splits equals the global top-5") {
    for (cut <- 0 to rows.length) {
      val (a, b) = rows.splitAt(cut)
      assert(agg.merge(foldAll(a), foldAll(b)) == expected, s"split at $cut")
      assert(agg.merge(foldAll(b), foldAll(a)) == expected, s"swapped at $cut")
    }
  }

  test("ties on the exact score break toward the smaller id") {
    val tied = Seq((0.4, 5L), (0.4, 1L), (0.4, 9L), (0.4, 3L), (0.4, 7L), (0.4, 2L))
    assert(foldAll(tied) == Seq((0.4, 1L), (0.4, 2L), (0.4, 3L), (0.4, 5L), (0.4, 7L)))
  }

  test("fewer rows than K returns all, sorted") {
    assert(foldAll(Seq((0.2, 2L), (0.6, 1L))) == Seq((0.6, 1L), (0.2, 2L)))
    assert(agg.merge(agg.zero, agg.zero) == Seq.empty)
  }
}
