package graft.queries

import graft.SparkSpec
import graft.streaming.{RecallAlertBus, StreamHarness}

/** s30's pager contract (VERDICT r13 next #3): a recall collapse planted
  * MID-STREAM must flip the per-batch alert — false after the benign batch,
  * true after the flood — and the flip must be DELIVERED per micro-batch on
  * [[RecallAlertBus]], not discovered by a later batch poll.
  *
  * The planted corpus (admission frozen at candCap = 0, the quota-exhausted
  * regime): 64 base vectors fan out from a shared axis in orthogonal
  * directions; batch 1's arrivals are base-shaped (their true neighbors ARE
  * base vectors, which the router's probe edges cover without any
  * admission, so recall stays high); batch 2 floods near the shared axis —
  * every flood vector beats every base-base cosine for EVERY query, so the
  * exact top-3 of base, benign, and flood queries alike becomes flood
  * vectors, which the frozen index cannot admit. Mean recall collapses and
  * the alert fires on the flood batch's commit. */
class StreamRecallAlertSpec extends SparkSpec {

  private val Dim = 84

  private def vec(axis: Int, t: Double, dir: Int): Array[Float] = {
    val a = new Array[Float](Dim)
    a(axis) = 1.0f
    a(dir) = t.toFloat
    a
  }

  private lazy val corpusDir: String = {
    val d = StreamHarness.tempDir("s30-collapse")
    import spark.implicits._
    val rows =
      // base 0..63: axis e0, spread t in [0.4, 0.589], directions e1..e64
      (0 until 64).map(i => (i.toLong, vec(0, 0.4 + 0.003 * i, 1 + i).toSeq)) ++
        // batch-1 benign 64..71: axis e0, t ~0.7 (never enters base top-3),
        // fresh directions e65..e72 — true neighbors are the small-t base
        (0 until 8).map(j => (64L + j, vec(0, 0.70 + 0.003 * j, 65 + j).toSeq)) ++
        // batch-2 flood 72..79: hugging the shared axis e0 (t ~0.001) —
        // cosine vs ANY vector ≈ 1/sqrt(1+t²) of that vector, above every
        // pre-existing pair
        (0 until 8).map(k => (72L + k, vec(0, 0.001 * (k + 1), 73 + k).toSeq))
    rows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("a mid-stream recall collapse flips the alert on the flood batch's commit") {
    RecallAlertBus.drain()
    val t = StreamingQueries.s28Maintain(spark, corpusDir, candCap = 0,
      monitor = true)
    val log = StreamingQueries.readParts(spark, t.alertDir)
      .orderBy("n_seen").collect()
      .map(r => (r.getAs[Long]("n_seen"), r.getAs[Double]("mean_recall"),
        r.getAs[Boolean]("alert")))
    assert(log.length == 2, s"expected one alert row per batch: ${log.toSeq}")
    val (benign, flood) = (log(0), log(1))
    assert(benign._1 == 8 && flood._1 == 16, s"batch split drifted: ${log.toSeq}")
    assert(!benign._3 && benign._2 > SimilarityQueries.MeanRecallFloor,
      s"benign batch should not alert: $benign")
    assert(flood._3 && flood._2 < SimilarityQueries.MeanRecallFloor,
      s"flood batch should alert: $flood")
    assert(benign._2 - flood._2 > 0.3,
      s"collapse not discriminating: benign ${benign._2} vs flood ${flood._2}")
    // Delivery, not just the durable log: the bus saw both rows, in batch
    // order, with the flip — the pager fired while the stream was live.
    val bus = RecallAlertBus.drain()
    assert(bus.map(a => (a.nSeen, a.alert)).toSeq == Seq((8L, false), (16L, true)),
      s"bus did not deliver the per-batch flip: $bus")
  }
}
