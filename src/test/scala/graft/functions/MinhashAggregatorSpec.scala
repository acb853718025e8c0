package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import MinhashAggregator.minhashUnion
import PortableHash.K

/** The Aggregator's merge properties — what makes the sketch distributable. */
class MinhashAggregatorSpec extends SparkSpec {

  private def sigs: Seq[Array[Long]] = {
    val rnd = new scala.util.Random(37)
    Seq.fill(200)(Array.fill(K)(math.abs(rnd.nextLong()) % PortableHash.P))
  }

  test("group signature equals the elementwise min of member signatures") {
    import spark.implicits._
    val data = sigs
    val got = data.toDF("sig").agg(minhashUnion(col("sig")).as("u"))
      .head().getSeq[Long](0)
    val expect = (0 until K).map(i => data.map(_(i)).min)
    assert(got == expect)
  }

  test("result is invariant to partitioning (partial-agg merge correctness)") {
    import spark.implicits._
    val df = sigs.toDF("sig")
    val results = Seq(1, 3, 7).map { n =>
      df.repartition(n).agg(minhashUnion(col("sig")).as("u"))
        .head().getSeq[Long](0)
    }
    assert(results.distinct.size == 1)
  }

  test("reduce/merge are associative and commutative on raw buffers") {
    val agg = new MinhashAggregator
    val Seq(a, b, c) = sigs.take(3)
    def m(x: Array[Long], y: Array[Long]) = agg.merge(x.clone(), y.clone())
    assert(m(m(a, b), c).toSeq == m(a, m(b, c)).toSeq)
    assert(m(a, b).toSeq == m(b, a).toSeq)
  }
}
