package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable EXACT top-C selection by (score ASC, id ASC) — the
  * aggregation-shaped alternative to a `row_number()` window for "best C
  * candidates per key" (e09's ADC scan): a window must shuffle every
  * scanned row into its key's partition before ranking, while this
  * aggregator folds map-side — each partition keeps a bounded sorted
  * buffer per key, so the shuffle carries ≤ C (score, id) pairs per
  * (key, partition) whatever the scan size. Merge is an ordered two-array
  * merge truncated at C; the union of per-partition top-Cs contains the
  * global top-C, so the result is exact and partitioning-independent
  * (same determinism class as the oracles' `ORDER BY score, id`).
  *
  * The buffer stays sorted, so the steady-state per-row cost is ONE
  * comparison against the current worst (full buffer + non-competitive row
  * → return unchanged); insertions are O(C) but only fire when a row beats
  * the worst, which happens O(C·ln(scan/C)) times per partition on
  * randomly ordered input.
  *
  * `finish` returns ids in rank order (ascending score, ties to low id);
  * callers that need the scores re-derive them (e09 re-ranks candidates
  * with exact cosine anyway).
  */
class TopCAggregator(c: Int)
    extends Aggregator[(Double, Long), (Array[Double], Array[Long]), Array[Long]] {

  override def zero: (Array[Double], Array[Long]) =
    (Array.empty[Double], Array.empty[Long])

  private def lt(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 < i2)

  override def reduce(buf: (Array[Double], Array[Long]), a: (Double, Long))
      : (Array[Double], Array[Long]) = {
    val (ds, ids) = buf
    val len = ds.length
    val (s, id) = a
    if (len == c && !lt(s, id, ds(len - 1), ids(len - 1))) return buf
    // Insertion position by (score, id) — binary search on the sorted buffer.
    var lo = 0
    var hi = len
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (lt(ds(mid), ids(mid), s, id)) lo = mid + 1 else hi = mid
    }
    val nlen = math.min(len + 1, c)
    val nds = new Array[Double](nlen)
    val nids = new Array[Long](nlen)
    System.arraycopy(ds, 0, nds, 0, lo)
    System.arraycopy(ids, 0, nids, 0, lo)
    nds(lo) = s
    nids(lo) = id
    System.arraycopy(ds, lo, nds, lo + 1, nlen - lo - 1)
    System.arraycopy(ids, lo, nids, lo + 1, nlen - lo - 1)
    (nds, nids)
  }

  override def merge(a: (Array[Double], Array[Long]), b: (Array[Double], Array[Long]))
      : (Array[Double], Array[Long]) = {
    val (ads, aids) = a
    val (bds, bids) = b
    val nlen = math.min(ads.length + bds.length, c)
    val nds = new Array[Double](nlen)
    val nids = new Array[Long](nlen)
    var i = 0
    var j = 0
    var k = 0
    while (k < nlen) {
      val takeA = j >= bds.length ||
        (i < ads.length && lt(ads(i), aids(i), bds(j), bids(j)))
      if (takeA) { nds(k) = ads(i); nids(k) = aids(i); i += 1 }
      else { nds(k) = bds(j); nids(k) = bids(j); j += 1 }
      k += 1
    }
    (nds, nids)
  }

  override def finish(buf: (Array[Double], Array[Long])): Array[Long] = buf._2

  override def bufferEncoder: Encoder[(Array[Double], Array[Long])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Array[Long])]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
