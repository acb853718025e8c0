package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.DedupFunctions._
import graft.functions.PortableHash._

/** The native codegen expressions must be bit-identical to the declarative
  * higher-order-function builders (which the DuckDB oracles mirror) — on
  * random text, edge cases, and unicode. */
class HashExpressionsSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.functions.expr.HashExpressions.register(spark)
  }

  private def texts: Seq[String] = {
    val rnd = new scala.util.Random(31)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    Seq.fill(60)(Seq.fill(rnd.nextInt(12))(words(rnd.nextInt(words.size)))
      .mkString(" ")) ++
      Seq("", " ", "  a  b ", "one", "one two", "héllo wörld déjà vu",
        "tab\tinside stays one-token")
  }

  test("graft_token_hashes == declarative tokenHashes") {
    import spark.implicits._
    val df = texts.toDF("text")
    val cmp = df.select(
      call_function("graft_token_hashes", col("text")).as("fast"),
      tokenHashes(col("text")).as("slow"))
    assert(cmp.filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("graft_shingle_hashes == declarative hashedShingles") {
    import spark.implicits._
    val df = texts.toDF("text")
      .select(tokenHashes(col("text")).as("th"))
    val cmp = df.select(
      call_function("graft_shingle_hashes", col("th"), lit(3)).as("fast"),
      hashedShingles(col("th"), 3).as("slow"))
    assert(cmp.filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("graft_minhash_sig == declarative minhashSignature (incl. empty -> nulls)") {
    import spark.implicits._
    val df = texts.toDF("text")
      .select(hashedShingles(tokenHashes(col("text")), 3).as("hs"))
    val cmp = df.select(
      call_function("graft_minhash_sig", col("hs")).as("fast"),
      minhashSignature(col("hs")).as("slow"))
    // null-safe compare: signatures with null entries compare via to_json
    assert(cmp.filter(to_json(col("fast")) =!= to_json(col("slow"))).count() == 0)
  }

  test("graft_simhash == declarative simhash") {
    import spark.implicits._
    val df = texts.filter(_.trim.nonEmpty).toDF("text")
      .select(tokenHashes(col("text")).as("th"))
    val cmp = df.select(
      call_function("graft_simhash", col("th")).as("fast"),
      simhash(col("th")).as("slow"))
    assert(cmp.filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("graft_string_hash == declarative stringHash") {
    import spark.implicits._
    val df = texts.toDF("text")
    val cmp = df.select(
      call_function("graft_string_hash", col("text")).as("fast"),
      stringHash(col("text")).as("slow"))
    assert(cmp.filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("graft_pretoken_counts == regexp_extract_all run counting") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val alphabet = "abZ09 ._-!\t\n\r\fé€"
    val fuzz = Seq.fill(200)(
      Seq.fill(rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    val edges = Seq("", " ", "ab12!!cd", "123", "a1b2c3", "!!!", "",
      "héllo wörld 42", "ab", "𝕊urrogate 𝄞pair42", "tab\ttab2")
    val pat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r\\f]+"
    val df = (fuzz ++ edges).toDF("text")
    val cmp = df.select(
      call_function("graft_pretoken_counts", col("text")).as("pt"),
      size(regexp_extract_all(col("text"), lit(pat), lit(0))).as("slow_n"),
      size(filter(regexp_extract_all(col("text"), lit(pat), lit(0)),
        t => t.rlike("^[0-9]+$"))).as("slow_d"))
    assert(cmp.filter(col("pt.n_bpeish") =!= col("slow_n") ||
      col("pt.n_digit_runs") =!= col("slow_d")).count() == 0)
  }

  test("native expressions run inside whole-stage codegen") {
    // A local relation would be constant-folded at plan time, so assert on a
    // real parquet scan (the shape every registered query uses).
    val plan = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(call_function("graft_token_hashes", col("text")).as("th"))
      .queryExecution.executedPlan.toString
    // The `*(n)` prefix marks a WholeStageCodegen stage in the tree string.
    assert(plan.linesIterator.exists(l =>
      l.trim.matches("""\*\(\d+\) Project \[tokenhashes.*""")), plan)
  }

  test("graft_bigram_hashes walks code points (surrogate pairs stay whole)") {
    import spark.implicits._
    // "a😀b" is 4 UTF-16 chars but 3 code points → 2 bigrams; a char-unit
    // walk would emit 3 (splitting the surrogate pair). DuckDB's
    // string_split(text, '') is code-point-based, so this pins the oracle
    // contract on text the ASCII corpus never exercises.
    val cases = texts ++ Seq("a😀b", "😀", "ab")
    val got = cases.toDF("text")
      .select(call_function("graft_bigram_hashes", col("text")).as("bg"))
      .collect().map(_.getSeq[Long](0))
    cases.zip(got).foreach { case (t, bg) =>
      val cps = t.codePoints().toArray
      val exp = (0 until math.max(0, cps.length - 1))
        .map(i => cps(i).toLong * 1114112L + cps(i + 1).toLong)
      assert(bg == exp, s"'$t': got $bg, expected $exp")
    }
  }

  test("graft_bigram_hashes matches DuckDB's oracle fragment on non-BMP text") {
    import spark.implicits._
    // Constants produced by running d38's oracle fragment
    //   list_transform(string_split(text, ''), c -> CAST(ord(c) AS BIGINT))
    //   → cs[i] * 1114112 + cs[i + 1]
    // in DuckDB 1.x over these fixtures (r10 ADVICE: the generated corpora
    // are ASCII, so oracle parity on supplementary-plane code points was
    // untested). DuckDB's string_split(text, '') + ord() walks CODE POINTS
    // — "a😀b" yields 2 bigrams, not the 3 a UTF-16 char walk would give —
    // and its length() counts code points too, matching UTF8String.numChars
    // for the length >= 2 pre-filter.
    val duckdb = Map(
      "a😀b" -> Seq(97L * 1114112L + 128512L, 128512L * 1114112L + 98L),
      "ab" -> Seq(97L * 1114112L + 98L))
    assert(duckdb("a😀b") == Seq(108197376L, 143176761442L)) // literal pin
    assert(duckdb("ab") == Seq(108068962L))
    val got = duckdb.keys.toSeq.toDF("text")
      .select(col("text"),
        call_function("graft_bigram_hashes", col("text")).as("bg"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    duckdb.foreach { case (t, exp) =>
      assert(got(t) == exp, s"'$t': Spark ${got(t)} != DuckDB $exp")
    }
  }
}
