package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The KMV sketch's distributability (set semantics + merge correctness)
  * and its estimator's accuracy band. */
class KmvAggregatorSpec extends SparkSpec {

  private val K = 64

  /** Deterministic pseudo-uniform hashes over [0, P) with duplicates. */
  private def hashes(n: Int, seed: Int): Seq[Long] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(math.abs(rnd.nextLong()) % PortableHash.P)
  }

  private def kmvUdaf =
    udaf(new KmvAggregator(K),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Long]())

  test("sketch equals the k smallest DISTINCT values (duplicates absorbed)") {
    import spark.implicits._
    val data = hashes(5000, 41) ++ hashes(5000, 41) // every value duplicated
    val got = data.toDF("h").agg(kmvUdaf(col("h")).as("mins"))
      .head().getSeq[Long](0)
    val expect = data.distinct.sorted.take(K)
    assert(got == expect)
  }

  test("result is invariant to partitioning (merge is a distinct-union)") {
    import spark.implicits._
    val df = hashes(20000, 43).toDF("h")
    val results = Seq(1, 3, 8).map { n =>
      df.repartition(n).agg(kmvUdaf(col("h")).as("mins"))
        .head().getSeq[Long](0)
    }
    assert(results.distinct.size == 1)
  }

  test("merge is associative, commutative, and dedupes across buffers") {
    val agg = new KmvAggregator(K)
    def buf(seed: Int): Array[Long] =
      hashes(300, seed).foldLeft(agg.zero)(agg.reduce)
    val (a, b, c) = (buf(1), buf(2), buf(3))
    def m(x: Array[Long], y: Array[Long]) = agg.merge(x.clone(), y.clone())
    assert(m(m(a, b), c).toSeq == m(a, m(b, c)).toSeq)
    assert(m(a, b).toSeq == m(b, a).toSeq)
    assert(m(a, a).toSeq == a.toSeq) // idempotent: same set, same sketch
    assert(m(a, b).toSeq == m(a, b).toSeq.distinct.sorted)
  }

  test("below k distinct values the sketch is exhaustive (exact count)") {
    val agg = new KmvAggregator(K)
    val vals = hashes(500, 47).distinct.take(K / 2)
    val out = vals.foldLeft(agg.zero)(agg.reduce)
    assert(out.toSeq == vals.sorted)
  }

  test("(k-1)P/h_k estimates a 50k-distinct stream within 3/sqrt(k)") {
    val agg = new KmvAggregator(K)
    val vals = hashes(80000, 53).distinct.take(50000)
    val sketch = vals.foldLeft(agg.zero)(agg.reduce)
    val est = (K - 1).toDouble * PortableHash.P / sketch(K - 1)
    val rel = math.abs(est - vals.size) / vals.size
    assert(rel <= 3.0 / math.sqrt(K.toDouble),
      s"KMV estimate $est vs ${vals.size} (rel err $rel)")
  }
}
