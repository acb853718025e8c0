package graft.queries

import graft.SparkSpec
import graft.streaming.StreamHarness

/** s29's reason to exist (VERDICT r12 next #6): an arrival that is a MEDIA
  * duplicate but not a TEXT duplicate must be flagged ON ARRIVAL — s26's
  * text-LSH admission alone is blind to it until the next batch m07 run.
  *
  * The plant is constructive, not data-dependent: two distinct Eulerian
  * walks over one bigram multigraph — "abcabda" (a→b→c→a→b→d→a) and
  * "abdabca" (a→b→d→a→b→c→a) — traverse the SAME edge multiset
  * {ab×2, bc, ca, bd, da}, so the two documents have exactly equal
  * byte-bigram histograms (both tokens start and end with 'a', making the
  * token-boundary bigrams equal too). `graft_phash` is a pure function of
  * that histogram, so the pHash signatures are IDENTICAL (Hamming 0: every
  * band collides and the claimant-signature verification passes), while the
  * tokens differ, so the MinHash shingle pipeline sees disjoint shingles
  * and no text band fires. Deterministic both ways — the test pins the gap,
  * not a lucky hash.
  */
class CrossmodalAdmissionSpec extends SparkSpec {

  test("s29 flags a planted media dup that text-LSH admission misses") {
    import spark.implicits._
    val t1 = "abcabda"
    val t2 = "abdabca"
    val docs = Seq(
      (0L, s"$t1 $t1 xyz qrs"),
      (1L, s"$t2 $t2 xyz qrs"),
      (2L, "completely different content sentence alpha"),
      (3L, "unrelated words beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val dir = StreamHarness.tempDir("xmodal-docs")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = StreamingQueries.s29CrossmodalAdmission.run(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    // columns: doc_id, n_text_coll, n_media_cand, n_media_coll,
    //          is_text_dup, is_media_dup, is_dup
    val planted = out(1L)
    assert(planted.getLong(1) == 0L,
      "plant unexpectedly text-collided — the shingle pipelines must differ")
    assert(!planted.getBoolean(4), "plant must NOT be text-flagged")
    assert(planted.getLong(2) >= 4L,
      "identical pHash must collide in all 4 media bands")
    assert(planted.getBoolean(5),
      "planted media dup not media-flagged (Hamming-0 verification failed)")
    assert(planted.getBoolean(6), "fused is_dup must fire on the media signal")
    // The bucket claimant itself is never flagged (no smaller id exists).
    assert(!out(0L).getBoolean(6), "claimant must not be flagged")
  }
}
