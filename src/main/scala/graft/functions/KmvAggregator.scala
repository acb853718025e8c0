package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable KMV (k-minimum-values) distinct-count sketch: the buffer is
  * the ≤k smallest DISTINCT hash values seen, kept as a sorted array.
  * Duplicates are absorbed at insert time (set semantics), so — unlike
  * [[TopCAggregator]] — the input needs NO dedup shuffle first: one
  * `groupBy(key).agg(...)` computes the sketch with map-side combine and
  * the shuffle carries ≤ k values per (key, partition) whatever the scan
  * size. The k-th smallest of the distinct hashes is a uniform order
  * statistic, so (k-1)·H/h_k estimates the distinct count over hash range
  * H; with fewer than k distinct values the sketch IS the exact distinct
  * set. Both the buffer content and the estimator are deterministic
  * functions of the input SET (insertion-order- and partitioning-
  * independent), so a single-threaded oracle replays them bit-exactly.
  *
  * Steady-state per-row cost is one comparison against the current worst
  * (full buffer + non-competitive hash → return unchanged); merge is an
  * ordered two-array union truncated at k.
  */
class KmvAggregator(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.empty[Long]

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val len = buf.length
    if (len == k && h >= buf(len - 1)) return buf
    // Insertion position; an exact hit means the value is already present.
    var lo = 0
    var hi = len
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) < h) lo = mid + 1 else hi = mid
    }
    if (lo < len && buf(lo) == h) return buf
    val nlen = math.min(len + 1, k)
    val out = new Array[Long](nlen)
    System.arraycopy(buf, 0, out, 0, lo)
    out(lo) = h
    System.arraycopy(buf, lo, out, lo + 1, nlen - lo - 1)
    out
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0
    var j = 0
    var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) { val x = a(i); i += 1; x } else { val x = b(j); j += 1; x }
      if (takeA && j < b.length && b(j) == v) j += 1 // drop the duplicate
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
