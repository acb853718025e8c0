package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** d26/d30's map-side scrub (optimization r18): both scrubs previously
  * shuffled the ENTIRE exploded token/window stream back onto doc_id for a
  * collect_list reassembly; the rewrite attaches the tiny stop/boiler set as
  * a one-row broadcast array and reassembles with a map-side array `filter`
  * (original order preserved by construction), leaving the df aggregate as
  * the only exchange. Correctness rests on two identities:
  *
  *  - per-doc `array_distinct` feeding a plain count ≡ the exploded
  *    (doc_id, token/window) DISTINCT feeding the df count;
  *  - filtering the original split array in place ≡ collecting surviving
  *    (pos, item) structs and re-sorting by pos.
  *
  * Pinned row-for-row against the r17 formulations (kept verbatim below) on
  * the fixture and on a synthetic corpus exercising the edges: empty text,
  * an all-stopwords document, repeated tokens, and runs of spaces (empty
  * split cells). */
class D26MapSideScrubSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq

  /** d26 as registered through r17. */
  private def d26R17(s: org.apache.spark.sql.SparkSession, dir: String) = {
    def docsT = graft.sources.Tables.load(s, dir, "documents")
    val tok = docsT
      .select(col("doc_id"), posexplode(split(col("text"), " "))
        .as(Seq("pos", "token")))
      .filter(col("token") =!= "")
    val stop = tok.select(col("doc_id"), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("token")).limit(5)
      .select(col("token"), lit(1).as("is_stop"))
    val re = tok.join(broadcast(stop), Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("is_stop").isNull, 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("is_stop").isNull,
            struct(col("pos"), col("token"))))),
          x => x.getField("token")), " ").as("scrubbed"))
    docsT.select(col("doc_id"))
      .join(re, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        md5(coalesce(col("scrubbed"), lit("")).cast("binary"))
          .as("scrubbed_digest"))
      .orderBy(col("doc_id"))
  }

  /** d30 as registered through r17 (W=3, min docs 5). */
  private def d30R17(s: org.apache.spark.sql.SparkSession, dir: String,
                     minDocs: Int = 5) = {
    def docsT = graft.sources.Tables.load(s, dir, "documents")
    val wins = docsT
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"),
        explode(sequence(lit(1),
          ceil(size(col("ws")) / lit(3.0)).cast("int"))).as("i"),
        col("ws"))
      .select(col("doc_id"), col("i"),
        array_join(slice(col("ws"),
          (col("i") - 1) * 3 + 1, lit(3)), " ").as("w"))
    val boiler = wins.groupBy(col("w"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("w"), lit(true).as("is_boiler"))
    wins.join(broadcast(boiler), Seq("w"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("is_boiler"), 1).otherwise(0)).cast("bigint").as("n_removed"),
        array_join(transform(
          sort_array(collect_list(when(col("is_boiler").isNull,
            struct(col("i"), col("w"))))),
          x => x.getField("w")), " ").as("kept_text"))
      .orderBy(col("doc_id"))
  }

  private def writeSynthetic(): String = {
    import spark.implicits._
    val tmp = graft.streaming.StreamHarness.tempDir("scrub-edge")
    val common = "the quick brown fox jumps"
    val docs0 = Seq(
      (1L, ""), // empty text: split -> [""], zero tokens
      (2L, "the the the the the"), // all-stopword candidate, repeats
      (3L, s"$common over a lazy dog"),
      (4L, s"$common over another lazy dog"),
      (5L, s"$common  double  spaced   tokens here"), // "" cells from runs
      (6L, s"$common and some unique trailing words beyond"),
      (7L, s"$common repeated $common inside one document body"),
      (8L, "entirely distinct vocabulary for this final row"))
    docs0.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("d26 map-side scrub equals the r17 collect_list reassembly (fixture)") {
    val old = rows(d26R17(spark, dir))
    val now = rows(TextQueries.d26StopwordScrub.run(spark, dir))
    assert(old.nonEmpty)
    assert(now == old,
      s"d26 diverged: new-only=${now.diff(old).take(3)} old-only=${old.diff(now).take(3)}")
  }

  test("d30 map-side scrub equals the r17 collect_list reassembly (fixture)") {
    val old = rows(d30R17(spark, dir))
    val now = rows(TextQueries.d30BoilerplateScrub.run(spark, dir))
    assert(old.nonEmpty)
    assert(now == old,
      s"d30 diverged: new-only=${now.diff(old).take(3)} old-only=${old.diff(now).take(3)}")
  }

  test("d26/d30 edge corpus: empty text, all-stop doc, repeats, space runs") {
    val tmp = writeSynthetic()
    val old26 = rows(d26R17(spark, tmp))
    val now26 = rows(TextQueries.d26StopwordScrub.run(spark, tmp))
    assert(old26.size == 8)
    assert(now26 == old26,
      s"d26 edge diverged: new-only=${now26.diff(old26)} old-only=${old26.diff(now26)}")
    val old30 = rows(d30R17(spark, tmp))
    val now30 = rows(TextQueries.d30BoilerplateScrub.run(spark, tmp))
    assert(now30 == old30,
      s"d30 edge diverged: new-only=${now30.diff(old30)} old-only=${old30.diff(now30)}")
  }

  test("the scrub set actually fires on the edge corpus (non-vacuous)") {
    val tmp = writeSynthetic()
    // d26: 'the' is a top-5 df token and must be scrubbed from doc 2
    val d2 = TextQueries.d26StopwordScrub.run(spark, tmp)
      .filter(col("doc_id") === 2L).collect()
    assert(d2.head.getAs[Long]("n_tokens") == 5L)
    assert(d2.head.getAs[Long]("n_kept") == 0L,
      "expected every token of doc 2 scrubbed - stop list did not fire")
    // d30 at the fixture threshold needs >=5 docs sharing a window; the
    // shared 'the quick brown' window appears in docs 3,4,5,6,7 (5 docs)
    val n30 = TextQueries.d30BoilerplateScrub.run(spark, tmp)
      .agg(sum(col("n_removed"))).collect().head.getLong(0)
    assert(n30 > 0L, "expected boilerplate removals on the edge corpus")
  }
}
