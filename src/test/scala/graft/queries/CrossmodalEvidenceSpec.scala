package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** m08's evidence algebra, recomputed independently: from the raw pHash
  * signatures and embeddings (collected once), rebuild the banded candidate
  * set, both similarity signals, and the four evidence classes in plain
  * Scala, and require the query's output to match row-for-row. Also pins
  * the operator's reason to exist on real fixture data: the `joint` class
  * is NON-EMPTY — pairs below both families' individual thresholds that
  * only the combined evidence surfaces.
  */
class CrossmodalEvidenceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("m08 evidence classes equal an independent recomputation and joint fires") {
    val sigs = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        call_function("graft_phash", col("text").cast("binary")).as("ph"))
      .select(col("doc_id"), col("ph.sig1"), col("ph.sig2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val vecs = graft.sources.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("ve"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cosOf(a: Long, b: Long): Option[Double] =
      for (va <- vecs.get(a); vb <- vecs.get(b)) yield {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < va.length) { d += va(i) * vb(i); na += va(i) * va(i); nb += vb(i) * vb(i); i += 1 }
        // Norms sqrt'd SEPARATELY, as the query divides by (nrm_a * nrm_b)
        // — sqrt(na*nb) differs in the last bit.
        d / (math.sqrt(na) * math.sqrt(nb))
      }
    // Band the signatures; candidate = any shared (band, value). Fixture
    // occupancy is far below MediaBandCap, so the uncapped recomputation is
    // exact — guarded, not assumed.
    val bands = sigs.flatMap { case (id, s1, s2) =>
      Seq((0, s1 & 0xffffL), (1, s1 >>> 16), (2, s2 & 0xffffL), (3, s2 >>> 16))
        .map { case (bn, bv) => ((bn, bv), id) }
    }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
    assert(bands.values.map(_.size).max <= MultimodalQueries.MediaBandCap,
      "fixture bucket occupancy exceeds the cap — recompute with the cap")
    val sigOf = sigs.map(s => s._1 -> ((s._2, s._3))).toMap
    val expected = bands.values.flatMap { ids =>
      for (i <- ids.indices; j <- (i + 1) until ids.size) yield (ids(i), ids(j))
    }.toSet.toSeq.sorted.flatMap { case (a, b) =>
      val (a1, a2) = sigOf(a); val (b1, b2) = sigOf(b)
      val ham = java.lang.Long.bitCount(a1 ^ b1) + java.lang.Long.bitCount(a2 ^ b2)
      if (ham > MultimodalQueries.JointHamming) None
      else {
        val c = cosOf(a, b)
        val media = ham <= 3
        val text = c.exists(_ >= SimilarityQueries.SemTau)
        val joint = !media && !text && c.exists(_ >= MultimodalQueries.JointTau)
        if (!(media || text || joint)) None
        else Some((a, b, ham,
          if (media && text) "both" else if (media) "media"
          else if (text) "text" else "joint", c))
      }
    }
    val got = MultimodalQueries.m08CrossmodalEvidence.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getString(4), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got.length == expected.length,
      s"row count: got ${got.length}, expected ${expected.length}")
    got.zip(expected).foreach { case (g, e) =>
      assert(g == e, s"mismatch: got $g expected $e")
    }
    // The class that justifies the operator actually fires on this fixture.
    assert(got.exists(_._4 == "joint"), "no joint-evidence pairs on the fixture")
    // And joint pairs are genuinely sub-threshold on BOTH axes.
    got.filter(_._4 == "joint").foreach { case (a, b, ham, _, c) =>
      assert(ham > 3 && ham <= MultimodalQueries.JointHamming)
      assert(c.exists(x => x >= MultimodalQueries.JointTau &&
        x < SimilarityQueries.SemTau), s"joint pair ($a,$b) cosine $c out of band")
    }
  }
}
