package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import PortableHash.K

/** Typed custom aggregate (the `Aggregator` rung of the extension ladder,
  * SURVEY.md §7.3): union of MinHash signatures as an elementwise min.
  *
  * MinHash's merge is associative and commutative, so this aggregator is
  * partial-aggregation friendly: `reduce` folds rows map-side inside each
  * partition, `merge` combines partition buffers at the reducer — the
  * sketch of a 100 TB corpus shuffles only one K-long buffer per partition
  * per group. Same semantics as the expression-composed d11 (which the
  * shared DuckDB oracle checks); this is the single-pass aggregate-native
  * form.
  */
class MinhashAggregator extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(K)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Array[Long]): Array[Long] = {
    var i = 0
    while (i < K) {
      if (sig(i) < buf(i)) buf(i) = sig(i)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = reduce(a, b)

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MinhashAggregator {
  /** Column-API handle: `minhashUnion(col("sig"))`. */
  val minhashUnion: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MinhashAggregator(),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]())
}
