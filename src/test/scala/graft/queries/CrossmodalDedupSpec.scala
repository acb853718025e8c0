package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** m07's reason to exist (VERDICT r11 next #3): a transitive duplicate pair
  * that NEITHER per-modality family flags alone. The planted corpus has
  * three assets A, B, C where A's TEXT duplicates B's text (identical
  * embeddings → an e15 semantic-dup edge) while B's IMAGE duplicates C's
  * image (identical payload bytes → an m04 pHash edge) — so (A, C) is one
  * duplicate asset group, invisible to m04 (A's bytes differ) and to e15
  * (C's embedding is orthogonal), visible only to the unified cluster
  * table. The spec asserts exactly that separation, on a corpus written
  * from scratch so the claim is constructive, not fixture luck.
  */
class CrossmodalDedupSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val out = graft.streaming.StreamHarness.tempDir("xmodal")
    val dim = SimilarityQueries.Dim
    def basis(i: Int, scale: Float = 1.0f): Seq[Float] =
      Seq.tabulate(dim)(j => if (j == i % dim) scale else 0.0f)
    // 17 mutually-orthogonal fillers (ids 0–16; the first 16 seed the
    // codebook), then A=17, B=18 sharing one direction, C=19 on its own.
    val embeddings = (0 to 16).map(i => (i.toLong, basis(i), i % 3)) ++ Seq(
      (17L, basis(50), 0), (18L, basis(50), 1), (19L, basis(40), 2))
    embeddings.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    // Texts: mutually diverse fillers; B and C share IDENTICAL bytes (pHash
    // Hamming 0); A's bytes are unrelated to B/C.
    def fillerText(i: Int): String =
      (0 until 40).map(k => s"w${i}x${(i * 7 + k * 13) % 97}").mkString(" ")
    val docs = (0 to 16).map(i => (i.toLong, fillerText(i))) ++ Seq(
      (17L, "alpha document about rivers and maps " * 4),
      (18L, "shared media payload bytes for b and c " * 4),
      (19L, "shared media payload bytes for b and c " * 4))
    docs.map { case (id, t) => (id, t, "en", "spec", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    out
  }

  test("transitive cross-modal duplicates unify only in m07") {
    val media = MultimodalQueries.m04MediaDupClusters.run(spark, dir)
      .select("doc_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val text = SimilarityQueries.e15Semdedup.run(spark, dir)
      .select("vec_id", "grp").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val unified = MultimodalQueries.m07CrossmodalDedup.run(spark, dir)
      .select("doc_id", "cluster", "is_canonical").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap

    // The legs see their own modality's pair and ONLY it.
    assert(text(17L) == text(18L), "text leg must link A and B (identical embeddings)")
    assert(text(17L) != text(19L), "text leg must NOT link A and C")
    assert(media(18L) == media(19L), "media leg must link B and C (identical bytes)")
    assert(media(17L) != media(18L), "media leg must NOT link A and B")

    // The unified table links all three through B — the pair (A, C) neither
    // family flags alone — and keeps ONE canonical asset for the group.
    assert(unified(17L)._1 == unified(19L)._1,
      s"m07 must unify A and C transitively: ${unified(17L)} vs ${unified(19L)}")
    assert(unified(18L)._1 == unified(17L)._1)
    val group = Seq(17L, 18L, 19L)
    assert(group.map(unified(_)._2).sum == 1,
      "exactly one canonical asset per unified group")
  }
}
