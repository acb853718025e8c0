package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import PortableHash._

/** Fold identities + Scala-model equivalence for the portable hash family —
  * the invariants every sketch oracle depends on. */
class PortableHashSpec extends SparkSpec {

  /** Scala model of [[PortableHash.stringHash]]. */
  private def modelStringHash(s: String): Long =
    s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % P)

  test("stringHash matches the fold model on a seeded sweep of ASCII strings") {
    val rnd = new scala.util.Random(11)
    val strs = Seq.fill(100)(rnd.alphanumeric.take(1 + rnd.nextInt(30)).mkString)
    import spark.implicits._
    val got = strs.toDF("s").select(stringHash(col("s")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == strs.map(modelStringHash))
  }

  test("stringHash of the empty string is the fold seed 0") {
    import spark.implicits._
    assert(Seq("").toDF("s").select(stringHash(col("s"))).head().getLong(0) == 0L)
  }

  test("foldHash of a singleton below P is the identity") {
    import spark.implicits._
    val got = Seq(123456789L).toDF("x")
      .select(foldHash(array(col("x"))).as("h")).head().getLong(0)
    assert(got == 123456789L % P)
  }

  test("foldHash matches its Scala model and every intermediate stays in int64") {
    val rnd = new scala.util.Random(13)
    val arrs = Seq.fill(50)(Seq.fill(1 + rnd.nextInt(8))(math.abs(rnd.nextLong()) % P))
    def model(a: Seq[Long]): Long = a.foldLeft(0L)((h, v) => (h * 31 + v) % P)
    import spark.implicits._
    val got = arrs.toDF("a").select(foldHash(col("a")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == arrs.map(model))
  }

  test("tokens drops empty strings from doubled/leading/trailing spaces") {
    import spark.implicits._
    val got = Seq("  a  b c ").toDF("s")
      .select(tokens(col("s")).as("t")).head().getSeq[String](0)
    assert(got == Seq("a", "b", "c"))
  }

  test("minhash seed lists are sized to K with every product in int64 range") {
    assert(A.length == K && B.length == K)
    assert(Bands * Rows == K)
    // a*h + b with h < P must not overflow: max a * max h + max b < 2^63
    val maxA = A.max
    assert(BigInt(maxA) * BigInt(P - 1) + BigInt(B.max) < BigInt(Long.MaxValue))
  }
}
