package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate: bounded top-K by (score DESC, id ASC) — the
  * map-side-combining form of `row_number().over(Window.partitionBy(key)
  * .orderBy(score.desc, id)) <= K`.
  *
  * The window form shuffles EVERY candidate row to its key's partition and
  * sorts there — |candidates| rows of shuffle for an output of K rows per
  * key. This aggregator keeps a ≤K-entry sorted buffer per (partition, key)
  * instead: `reduce` folds candidates map-side, `merge` combines two sorted
  * buffers at the reducer, so the shuffle carries at most K entries per
  * partition per key however many candidates the scan produces. e18's
  * recall-monitor exact leg uses it over the |sample|·n brute-force
  * candidate stream: the r11 window formulation made the monitor's shuffle
  * grow with the corpus; this one's shuffle is index-metadata-sized.
  *
  * Determinism: (score DESC, id ASC) is a TOTAL order (ties on the exact
  * double break by id), and bounded-top-K under a total order is an
  * associative, commutative merge — the result is independent of row order
  * and partitioning, so the DuckDB oracle's `row_number()` formulation
  * matches bit-for-bit.
  */
class TopKCosAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  /** Total order even for NaN scores (a zero-norm embedding yields 0/0
    * cosine): primitive `>`/`==` are both false against NaN, which would
    * order NaN candidates arbitrarily and drop them nondeterministically.
    * NaN ranks FIRST (better than every real score), matching Spark's
    * window sort under DESC and DuckDB's ORDER BY (both treat NaN as
    * greatest); NaN-NaN ties break by id like any tie. Real scores keep the
    * primitive comparison so -0.0 == 0.0 stays a tie (id break), exactly as
    * both engines' sorts treat it. */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val an = a._1.isNaN
    val bn = b._1.isNaN
    if (an || bn) (an && !bn) || (an && bn && a._2 < b._2)
    else a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
  }

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    if (buf.length == k && !better(x, buf.last)) buf
    else {
      val (front, back) = buf.span(better(_, x))
      (front ++ (x +: back)).take(k)
    }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    // Merge of two sorted runs, truncated at k.
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
    var (i, j) = (0, 0)
    while (out.length < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && better(a(i), b(j)))) {
        out += a(i); i += 1
      } else { out += b(j); j += 1 }
    }
    out.toSeq
  }

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKCosAggregator {
  /** Column-API handle: `top5(col("cosine"), col("vec_id"))` → sorted
    * `array<struct<_1: score, _2: id>>` of the group's top 5. */
  val top5: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKCosAggregator(5),
      ExpressionEncoder[(Double, Long)]())

  /** Top-[[graft.queries.SimilarityQueries.KnnK]] form for graph-index
    * monitors (e19). */
  val top3: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKCosAggregator(3),
      ExpressionEncoder[(Double, Long)]())

  /** The graph BUILD's top-[[graft.queries.SimilarityQueries.KnnK]]
    * extraction (VERDICT r16 next #2): sized from KnnK itself so the build
    * and the monitors cannot drift apart if K changes. Referenced lazily
    * (inside `listPairs`), so the cross-object init order is safe. */
  val topKnnK: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new TopKCosAggregator(graft.queries.SimilarityQueries.KnnK),
      ExpressionEncoder[(Double, Long)]())
}
