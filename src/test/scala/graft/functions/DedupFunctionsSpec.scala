package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import PortableHash._
import DedupFunctions._

/** Sketch-operator building blocks: shingling, signatures, banding, SimHash. */
class DedupFunctionsSpec extends SparkSpec {

  private def modelStringHash(s: String): Long =
    s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % P)
  private def modelFold(a: Seq[Long]): Long =
    a.foldLeft(0L)((h, v) => (h * 31 + v) % P)

  test("hashedShingles of a k-token doc is the single fold of its token hashes") {
    import spark.implicits._
    val got = Seq("alpha beta gamma").toDF("text")
      .select(tokenHashes(col("text")).as("th"))
      .select(hashedShingles(col("th"), 3).as("hs"))
      .head().getSeq[Long](0)
    val expect = Seq(modelFold(Seq("alpha", "beta", "gamma").map(modelStringHash)))
    assert(got == expect)
  }

  test("hashedShingles is empty (not null) below k tokens") {
    import spark.implicits._
    val got = Seq("one two").toDF("text")
      .select(hashedShingles(tokenHashes(col("text")), 3).as("hs"))
      .head().getSeq[Long](0)
    assert(got == Seq.empty)
  }

  test("hashedShingles dedupes repeated shingles") {
    import spark.implicits._
    val got = Seq("a b a b a b").toDF("text") // shingles: aba, bab, aba, bab
      .select(hashedShingles(tokenHashes(col("text")), 3).as("hs"))
      .head().getSeq[Long](0)
    assert(got.length == 2)
  }

  test("minhashSignature has K entries and matches the Scala model") {
    import spark.implicits._
    val hashes = Seq(3L, 99999L, 1234567L)
    val got = Seq(hashes).toDF("h")
      .select(minhashSignature(col("h")).as("sig")).head().getSeq[Long](0)
    val expect = (0 until K).map(i => hashes.map(x => (A(i) * x + B(i)) % P).min)
    assert(got == expect)
  }

  test("bandKeys folds Rows-sized signature slices into Bands keys") {
    import spark.implicits._
    val sig = (1L to K.toLong).toSeq
    val got = Seq(sig).toDF("sig")
      .select(bandKeys(col("sig")).as("bk")).head().getSeq[Long](0)
    val expect = (0 until Bands).map(j => modelFold(sig.slice(j * Rows, j * Rows + Rows)))
    assert(got == expect)
  }

  test("signatureMatches counts positionwise agreement") {
    import spark.implicits._
    val sa = (1L to K.toLong).toSeq
    val sb = sa.updated(0, 999L).updated(5, 999L)
    val got = Seq((sa, sb)).toDF("a", "b")
      .select(signatureMatches(col("a"), col("b")).as("m")).head().getLong(0)
    assert(got == K - 2)
  }

  test("simhash of a single token is its hash's low 30 bits") {
    import spark.implicits._
    val h = modelStringHash("solo")
    val got = Seq("solo").toDF("text")
      .select(simhash(tokenHashes(col("text"))).as("sh")).head().getLong(0)
    assert(got == (h & ((1L << 30) - 1)))
  }

  test("wordShingles produces distinct space-joined k-grams from a token array") {
    import spark.implicits._
    val got = Seq("the cat sat on the cat sat").toDF("text")
      .select(wordShingles(tokens(col("text")), 3).as("sh"))
      .head().getSeq[String](0)
    assert(got.contains("the cat sat") && got.distinct == got)
    assert(got.length == 4) // "the cat sat","cat sat on","sat on the","on the cat"
  }
}
