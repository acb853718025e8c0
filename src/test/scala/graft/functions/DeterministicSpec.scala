package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import Deterministic._

/** The bit-reproducibility contract behind every float oracle: decimal-routed
  * sums must not depend on partitioning/aggregation order. */
class DeterministicSpec extends SparkSpec {

  test("dsum is bit-identical across partition layouts") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val xs = Seq.fill(5000)(rnd.nextDouble() * 1e6 - 5e5)
    val df = xs.toDF("x")
    val sums = Seq(1, 3, 7, 16).map { n =>
      df.repartition(n).agg(dsum(col("x")).as("s")).head().getDouble(0)
    }
    assert(sums.distinct.size == 1,
      s"order-dependent sum: ${sums.map(java.lang.Double.doubleToLongBits).distinct}")
  }

  test("davg is bit-identical across partition layouts") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val xs = Seq.fill(3000)(rnd.nextDouble() * 100)
    val df = xs.toDF("x")
    val avgs = Seq(1, 5, 11).map { n =>
      df.repartition(n).agg(davg(col("x")).as("a")).head().getDouble(0)
    }
    assert(avgs.distinct.size == 1)
  }

  test("dsum equals the exact BigDecimal model on magnitude-spread input") {
    import spark.implicits._
    // Values span 12 orders of magnitude but stay inside dsum's documented
    // decimal(18,6) domain (|x| < 1e12, 6 fractional digits of certainty).
    val rnd = new scala.util.Random(29)
    val xs = (1 to 3000).map { i =>
      val mag = math.pow(10, rnd.nextInt(12)).toLong
      (rnd.nextInt(2000) - 1000).toDouble * mag / 1000.0
    }
    val df = xs.toDF("x")
    val expect = xs.map(x => BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble
    val d = Seq(1, 7, 13).map { n =>
      df.repartition(n).agg(dsum(col("x")).as("s")).head().getDouble(0)
    }
    assert(d.distinct.size == 1)
    assert(d.head == expect)
  }
}
