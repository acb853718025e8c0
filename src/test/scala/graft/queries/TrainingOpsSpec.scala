package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Semantic pins for the round-10 training-pipeline additions: d32
  * substring-duplication scoring, d33 mixture reweighting, e10 multi-probe
  * LSH range search. The DuckDB oracles prove cross-engine value equality;
  * these tests prove the values mean what the operator claims (the oracle
  * would happily replay a wrong formula on both engines).
  */
class TrainingOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("graft_shingle_hashes_all is positional: length n-k+1, superset-of-distinct") {
    Tables.prepare(spark)
    val df = spark.createDataFrame(Seq((1L, "a b a b a b"))).toDF("id", "text")
      .select(call_function("graft_token_hashes", col("text")).as("th"))
      .select(
        call_function("graft_shingle_hashes_all", col("th"), lit(2)).as("all2"),
        call_function("graft_shingle_hashes", col("th"), lit(2)).as("dist2"))
    val row = df.collect().head
    val all2 = row.getSeq[Long](0)
    val dist2 = row.getSeq[Long](1)
    // 6 tokens, k=2 → 5 positional windows but only 2 distinct grams
    // ("a b" and "b a") — positional keeps the multiset.
    assert(all2.length == 5, s"expected 5 positional 2-grams, got ${all2.length}")
    assert(dist2.length == 2)
    assert(all2.toSet == dist2.toSet)
  }

  test("d32 equals an independent in-memory recomputation of cross-doc gram duplication") {
    val d32 = TextQueries.d32SubstringDup.run(spark, dir)
      .select("doc_id", "n_grams", "n_dup_grams").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // Truth: positional gram hashes per doc via the expression, then the
    // dup rollup recomputed in plain Scala — an independent implementation
    // of the aggregation the operator runs distributed.
    val grams = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        call_function("graft_shingle_hashes_all",
          call_function("graft_token_hashes", col("text")),
          lit(TextQueries.DupGramK)).as("gs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
    val docsPerGram = grams.flatMap { case (id, gs) => gs.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.length }
    grams.foreach { case (id, gs) =>
      val nd = gs.count(g => docsPerGram(g) >= 2).toLong
      assert(d32(id) == ((gs.length.toLong, nd)),
        s"doc $id: got ${d32(id)}, recomputed (${gs.length}, $nd)")
    }
    // The signal is non-trivial and discriminative on this corpus.
    assert(d32.values.exists(_._2 > 0), "no cross-document duplication found")
    assert(d32.values.exists { case (ng, nd) => nd < ng },
      "every doc scored fully duplicated")
  }

  test("d33: shares sum to 1 and weights equalize expected token mass per source") {
    val rows = TextQueries.d33MixtureWeights.run(spark, dir).collect()
    val shares = rows.map(_.getAs[Double]("token_share"))
    assert(math.abs(shares.sum - 1.0) < 1e-9, s"shares sum ${shares.sum}")
    val total = rows.map(_.getAs[Long]("n_tokens")).sum.toDouble
    val target = total / rows.length
    rows.foreach { r =>
      val mass = r.getAs[Long]("n_tokens") * r.getAs[Double]("sample_weight")
      assert(math.abs(mass - target) < 1e-6 * target,
        s"source ${r.getString(0)}: reweighted mass $mass != uniform target $target")
    }
  }

  test("d34: HLL estimate tracks the exact distinct count within sketch error") {
    val m = 64
    val rows = TextQueries.d34HllDistinct.run(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getAs[Int]("n_regs"),
        r.getAs[Double]("est_distinct"))).toMap
    val exact = Tables.load(spark, dir, "documents")
      .select(col("lang"),
        explode(call_function("graft_token_hashes", col("text"))).as("h"))
      .groupBy("lang").agg(countDistinct(col("h")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == exact.keySet)
    exact.foreach { case (lang, nd) =>
      val (nRegs, raw) = rows(lang)
      // The operator's contract is the RAW harmonic estimator plus the
      // register count; the standard small-range (linear-counting)
      // correction uses ln, which is not cross-engine bit-portable, so the
      // consumer applies it — as this test does — from n_regs.
      val corrected =
        if (raw <= 2.5 * m && nRegs < m) m * math.log(m.toDouble / (m - nRegs))
        else raw
      val rel = math.abs(corrected - nd) / nd
      // m=64 → stderr ≈ 13%; 40% is a ±3σ envelope, generous enough to be
      // deterministic on the fixture yet tight enough to catch a broken
      // rank or register formula (which lands orders of magnitude off).
      assert(rel <= 0.4, s"$lang: corrected $corrected (raw $raw, regs $nRegs) vs exact $nd (rel $rel)")
    }
  }

  test("d35: near-dup candidate pairs never straddle the split, ratio is ~90/10") {
    val split = TextQueries.d35LeakageSafeSplit.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    // The leakage property, asserted on the PAIRS (not the clusters the
    // operator itself derives): every LSH near-dup candidate pair must
    // land on one side.
    val pairs = TextQueries.d07MinhashPairs.run(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture lost its near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b),
        s"near-dup pair ($a, $b) straddles the split: ${split(a)} vs ${split(b)}")
    }
    val trainFrac = split.values.count(_ == "train").toDouble / split.size
    assert(trainFrac > 0.8 && trainFrac < 0.97, s"train fraction $trainFrac")
  }

  test("e10: results are a subset of brute-force range matches with recall >= 0.5") {
    val got = SimilarityQueries.e10RangeSearch.run(spark, dir)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // Brute-force τ-range truth over the same derived query set.
    val vecs = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val n = vecs.length
    val qsz = SimilarityQueries.annQuerySetSize(n)
    val nrm = vecs.map { case (_, v) => math.sqrt(v.map(x => x * x).sum) }.toArray
    val byId = vecs.toMap
    val ids = vecs.map(_._1)
    val truth = (for {
      qi <- ids.indices if ids(qi) < qsz
      xi <- ids.indices if ids(xi) != ids(qi)
      dot = byId(ids(qi)).zip(byId(ids(xi))).map { case (a, b) => a * b }.sum
      if dot / (nrm(qi) * nrm(xi)) >= SimilarityQueries.RangeTau
    } yield (ids(qi), ids(xi))).toSet
    assert(truth.nonEmpty, "fixture has no τ-range matches")
    assert(got.subsetOf(truth),
      s"e10 returned ${got.diff(truth).size} pairs below τ or out of query set")
    val recall = got.size.toDouble / truth.size
    assert(recall >= 0.5, s"multi-probe range recall $recall < 0.5 (${got.size}/${truth.size})")
  }

  test("d37 finds doc-in-doc containment that symmetric Jaccard misses") {
    // Planted asymmetry: doc 1 is a 30-token passage, doc 2 quotes it
    // verbatim inside ~10x unrelated prose, doc 3 is unrelated filler.
    val quote = (1 to 30).map(i => s"q$i").mkString(" ")
    val wrapper = (1 to 300).map(i => s"w$i").mkString(" ")
    val filler = (1 to 100).map(i => s"f$i").mkString(" ")
    val tmp = graft.streaming.StreamHarness.tempDir("d37-fixture")
    spark.createDataFrame(Seq(
      (1L, quote), (2L, s"$wrapper $quote"), (3L, filler)))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextQueries.d37ContainmentDup.run(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length == 1, s"expected exactly the planted pair, got ${got.toSeq}")
    val (a, b, cab, cba) = got.head
    assert((a, b) == (1L, 2L))
    assert(cab == 1.0, s"full quote should be fully contained, got $cab")
    // With A fully contained (I = |A|), Jaccard = |A|/|B| = cont_b_in_a —
    // far below d09's 0.5 threshold and in the regime where d07/d09's LSH
    // bands essentially never collide: the MEASURE, not the threshold, is
    // what misses doc-in-doc duplication.
    assert(cba < 0.15, s"planted pair not in the LSH-blind regime: jaccard = $cba")
  }

  test("d36: CMS estimates never underestimate and miss no true heavy hitter") {
    val est = TextQueries.d36CmsHeavy.run(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // Exact truth: full token frequency table (affordable at gate scale;
    // the operator's point is that PRODUCTION never builds this).
    val exact = Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
      .groupBy("t").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    // One-sided error: a CMS counter only ever ADDS colliding mass.
    est.foreach { case (tok, e) =>
      assert(e >= exact(tok), s"CMS underestimated '$tok': $e < ${exact(tok)}")
    }
    // No false negatives: every token with true count ≥ N/256 must appear
    // (its estimate is ≥ its true count, so it cannot fall below the cut).
    val trueHeavy = exact.filter { case (_, c) => c * 256 >= n }.keySet
    assert(trueHeavy.nonEmpty, "fixture has no true heavy hitters")
    val missed = trueHeavy.diff(est.keySet)
    assert(missed.isEmpty, s"CMS missed true heavy hitters: $missed")
    // Accuracy sanity at this geometry: estimates stay within the standard
    // 2N/W additive bound for all reported tokens.
    est.foreach { case (tok, e) =>
      assert(e - exact(tok) <= 2 * n / 512,
        s"'$tok' estimate $e exceeds true ${exact(tok)} by more than 2N/W")
    }
  }

  test("d38 equals an independent in-memory bigram-rarity recomputation") {
    val got = TextQueries.d38BigramLm.run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // Truth: the whole model retrained in plain Scala from the raw text.
    val texts = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .filter(_._2.length >= 2)
    // The operator carries bigrams as cp1*0x110000 + cp2 codes (truly
    // injective — multiplier ≥ the code-point alphabet, no mod); recompute
    // the same unit from code points.
    val bgs = texts.flatMap { case (id, t) =>
      val cps = t.codePoints().toArray
      (0 until cps.length - 1).map(i =>
        (id, cps(i).toLong * 1114112L + cps(i + 1).toLong))
    }
    val cnt = bgs.groupBy(_._2).map { case (bg, xs) => bg -> xs.length.toLong }
    val n = bgs.length.toLong
    val rarity = cnt.map { case (bg, c) => bg -> (n + 1) / (c + 1) }
    val exp = bgs.groupBy(_._1).map { case (id, xs) =>
      val rs = xs.map(x => rarity(x._2)).sum
      id -> ((xs.length.toLong, rs, rs.toDouble / xs.length.toDouble))
    }
    assert(got.keySet == exp.keySet)
    exp.foreach { case (id, e) =>
      assert(got(id) == e, s"doc $id: got ${got(id)}, recomputed $e")
    }
    // Rarity discriminates: not all docs score identically.
    assert(got.values.map(_._3).toSet.size > 1, "constant rarity score")
  }

  test("d39 keeps the best-quality member of every multi-doc near-dup cluster") {
    val clusters = TextQueries.d21DupClusters.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._2).filter(_._2.length >= 2)
      .map { case (cl, xs) => cl -> xs.map(_._1) }
    val qual = TextQueries.d04QualityScore.run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(4), r.getInt(1)))).toMap
    val got = TextQueries.d39QualityCanonical.run(spark, dir).collect()
    assert(got.length == clusters.size,
      s"${got.length} decision rows for ${clusters.size} multi-member clusters")
    assert(clusters.nonEmpty, "no multi-member clusters at this SF")
    got.foreach { r =>
      val (cl, keep) = (r.getLong(0), r.getLong(1))
      val members = clusters(cl)
      // Keep rule: is_quality DESC, n_tokens DESC, doc_id ASC.
      val best = members.minBy(id => (-qual(id)._1, -qual(id)._2, id))
      assert(keep == best, s"cluster $cl: kept $keep, best-quality is $best")
      assert(r.getLong(3) == members.length.toLong)
      assert((r.getLong(1) != cl) == (r.getInt(5) == 1))
    }
    // The rule actually diverges from min-id somewhere on this corpus —
    // otherwise the operator is d21's canonical under another name.
    assert(got.exists(_.getInt(5) == 1), "quality keep rule never diverged from min-id")
  }

  test("d40 packs every token exactly once into full fixed-budget sequences") {
    val S = 128 // PackSeqTokens — the training contract this spec pins
    val rows = TextQueries.d40SequencePack.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getInt(4))) // (seq_id, doc_id, tok_start, doc_tok_start, tok_len)
    val nTok = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // (1) Every token of every document lands in EXACTLY one segment:
    // per-doc segments are contiguous from 0 and sum to the token count.
    rows.groupBy(_._2).foreach { case (doc, segs) =>
      val sorted = segs.sortBy(_._4)
      assert(sorted.head._4 == 0L, s"doc $doc: first segment starts at ${sorted.head._4}")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 + a._5 == b._4,
            s"doc $doc: gap/overlap between segments at ${a._4 + a._5} vs ${b._4}")
        case _ => ()
      }
      assert(sorted.map(_._5.toLong).sum == nTok(doc),
        s"doc $doc: packed ${sorted.map(_._5).sum} of ${nTok(doc)} tokens")
    }
    assert(rows.map(_._2).toSet == nTok.keySet, "some document never packed")
    // (2) No sequence exceeds the budget; zero padding: every sequence is
    // exactly S tokens except the last, and segments tile [0, S).
    val lastSeq = rows.map(_._1).max
    rows.groupBy(_._1).foreach { case (seq, segs) =>
      val sorted = segs.sortBy(_._3)
      assert(sorted.head._3 == 0, s"seq $seq starts at ${sorted.head._3}")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 + a._5 == b._3, s"seq $seq: segment gap/overlap")
        case _ => ()
      }
      val total = sorted.map(_._5).sum
      assert(total <= S, s"seq $seq holds $total > $S tokens")
      if (seq != lastSeq) assert(total == S, s"seq $seq padded: $total < $S")
    }
    // (3) Deterministic doc_id-order concatenation: within a sequence,
    // segment order equals doc_id order.
    rows.groupBy(_._1).foreach { case (seq, segs) =>
      val byPos = segs.sortBy(_._3).map(_._2)
      assert(byPos.sameElements(byPos.sorted), s"seq $seq not in doc_id order")
    }
  }

  test("d41 equals an independent in-memory recomputation of within-doc repetition") {
    val got = TextQueries.d41GopherRepetition.run(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_ => r.getDouble(2)),
          Option(r.get(3)).map(_ => r.getDouble(3)), r.getBoolean(4))).toMap
    val texts = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(texts.length == got.size)
    texts.foreach { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val grams = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val (nG, topF, dupF, keep) = got(id)
      assert(nG == grams.length, s"doc $id: n_grams $nG vs ${grams.length}")
      if (grams.isEmpty) {
        assert(topF.isEmpty && dupF.isEmpty && keep, s"doc $id degenerate row wrong")
      } else {
        val counts = grams.groupBy(identity).map(_._2.length)
        val expTop = counts.max.toDouble / grams.length.toDouble
        val expDup = counts.filter(_ >= 2).sum.toDouble / grams.length.toDouble
        assert(topF.contains(expTop), s"doc $id top_gram_frac")
        assert(dupF.contains(expDup), s"doc $id dup_gram_frac")
        assert(keep == (expTop < 0.2 && expDup < 0.2), s"doc $id keep verdict")
      }
    }
    // The thresholds actually bite on this corpus — otherwise the verdict
    // column is untested.
    assert(got.values.exists(!_._4), "no document ever flagged repetitive")
    assert(got.values.exists(_._4), "every document flagged repetitive")
  }

  test("d42 equals an independent in-memory BM25 recomputation (exact doubles)") {
    val rows = TextQueries.d42Bm25Rank.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    val n = docs.length.toLong
    val dl = docs.map { case (id, t) => id -> t.split(" ", -1).length.toLong }.toMap
    val avgdl = dl.values.sum.toDouble / n.toDouble
    val tf = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    }.toMap
    val qsz = SimilarityQueries.annQuerySetSize(n)
    val qterms = docs.filter(_._1 < qsz).map { case (id, t) =>
      id -> t.split(" ").take(4).filter(_.nonEmpty).distinct.toSeq
    }
    val allQTokens = qterms.flatMap(_._2).distinct
    val df = allQTokens.map(t => t -> tf.count(_._2.contains(t)).toLong).toMap
    val expected = qterms.flatMap { case (qid, terms) =>
      docs.map(_._1).filter(_ != qid).flatMap { d =>
        val sq = terms.filter(t => tf(d).contains(t)).map { t =>
          val idf = (n.toDouble - df(t) + 0.5) / (df(t) + 0.5)
          val tfn = (tf(d)(t) * 2.2) /
            (tf(d)(t) + 1.2 * (0.25 + 0.75 * (dl(d).toDouble / avgdl)))
          math.floor((idf * tfn) * 1048576.0).toLong
        }.sum
        if (sq == 0L && terms.forall(t => !tf(d).contains(t))) None
        else Some((qid, d, sq))
      }.sortBy { case (_, d, sq) => (-(sq.toDouble / 1048576.0), d) }
        .take(5).zipWithIndex
        .map { case ((q, d, sq), i) => (q, d, i + 1, sq.toDouble / 1048576.0) }
    }
    assert(rows.sortBy(r => (r._1, r._3)).toSeq == expected.sortBy(r => (r._1, r._3)).toSeq,
      s"BM25 mismatch: got ${rows.take(3).toSeq} expected ${expected.take(3)}")
  }

  test("d43 keep verdicts recompute exactly and kept token mass tracks the budget") {
    import graft.functions.PortableHash.{A, B, P}
    val rows = TextQueries.d43MixtureApply.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ").count(_.nonEmpty).toLong))
    assert(rows.length == docs.length)
    // Independent recomputation: per-source totals, integer budget,
    // floored threshold, family-4 hash compare.
    val bySrc = docs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val tot = bySrc.values.sum
    val budget = tot / (2L * bySrc.size)
    val thresh = bySrc.map { case (s, stok) =>
      s -> (if (stok <= budget) P
            else math.floor(budget.toDouble / stok.toDouble * P.toDouble).toLong)
    }
    docs.foreach { case (id, src, ntok) =>
      val keepExp = (A(4) * (id % P) + B(4)) % P < thresh(src)
      val got = rows.find(_._1 == id).get
      assert(got._3 == ntok, s"doc $id n_tokens")
      assert(got._4 == keepExp, s"doc $id keep")
    }
    // The budget bites (some source downsampled) and kept mass per
    // downsampled source lands near its budget (hash-threshold sampling is
    // rate-exact in expectation; 3σ Bernoulli slack on this corpus).
    assert(rows.exists(!_._4), "no document ever dropped")
    bySrc.foreach { case (src, stok) =>
      if (thresh(src) < P) {
        val kept = rows.filter(r => r._2 == src && r._4).map(_._3).sum
        assert(math.abs(kept - budget) <= math.max(3 * stok / 10, 500L),
          s"source $src kept $kept vs budget $budget")
      }
    }
  }

  test("e15 keeps exactly the farthest-from-centroid member per group; groups refine e08") {
    val rows = SimilarityQueries.e15Semdedup.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.length == 500)
    val byGrp = rows.groupBy(_._2)
    byGrp.foreach { case (grp, rs) =>
      // Group label is the min member id (the CC min-label fixpoint).
      assert(rs.map(_._1).min == grp, s"grp $grp label is not min member")
      // Exactly one keep, and it is the (min ccos, min vec_id) member —
      // SemDeDup's farthest-from-centroid policy.
      val keeps = rs.filter(_._4)
      assert(keeps.length == 1, s"grp $grp has ${keeps.length} keeps")
      val best = rs.minBy(r => (r._3, r._1))
      assert(keeps.head._1 == best._1,
        s"grp $grp kept ${keeps.head._1}, farthest is ${best._1}")
    }
    // The policy bites on this corpus (there are multi-member groups) and
    // ccos is a real cosine.
    assert(rows.exists(!_._4), "no duplicate ever removed")
    assert(rows.forall(r => r._3 >= -1.0000001 && r._3 <= 1.0000001))
    // e15's edge set (ptau only) is a subset of e08's (ptau ∪ τ-hops), so
    // every e15 group must sit entirely inside one e08 cluster.
    val e08 = SimilarityQueries.e08SemanticClusters.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byGrp.foreach { case (grp, rs) =>
      assert(rs.map(r => e08(r._1)).distinct.length == 1,
        s"e15 grp $grp straddles e08 clusters")
    }
  }

  test("e14 fusion scores recompute from the leg ranks it reports") {
    val rows = SimilarityQueries.e14HybridRrf.run(spark, dir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 8L).toSet, s"qids ${byQ.keySet}")
    byQ.foreach { case (qid, rs) =>
      assert(rs.length == 5, s"qid $qid has ${rs.length} fused rows")
      val sorted = rs.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).sameElements(1 to 5))
      // rrf recomputes from the reported leg ranks, exact doubles.
      sorted.foreach { r =>
        val rv = if (r.isNullAt(4)) None else Some(r.getInt(4))
        val rk = if (r.isNullAt(5)) None else Some(r.getInt(5))
        assert(rv.nonEmpty || rk.nonEmpty)
        val exp = rv.map(x => 1.0 / (60.0 + x)).getOrElse(0.0) +
          rk.map(x => 1.0 / (60.0 + x)).getOrElse(0.0)
        assert(r.getDouble(3) == exp, s"qid $qid id ${r.getLong(1)} rrf")
      }
      // Fused order is rrf DESC (ties by id ASC).
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getDouble(3) > b.getDouble(3) ||
            (a.getDouble(3) == b.getDouble(3) && a.getLong(1) < b.getLong(1)))
        case _ => ()
      }
    }
  }

  test("d44 equals an independent in-memory DSIR recomputation; en scores above non-en") {
    val got = TextQueries.d44DsirWeights.run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // Truth: bucketed bigram features per doc via the kernel, then both
    // rarity models and the score recomputed in plain Scala.
    val feats = Tables.load(spark, dir, "documents")
      .filter(length(col("text")) >= 2)
      .select(col("doc_id"), col("lang"),
        call_function("graft_bigram_hashes", col("text")).as("bg"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getSeq[Long](2).map(_ % TextQueries.DsirBuckets)))
    val cRaw = feats.flatMap(_._3).groupBy(identity).map { case (f, xs) => f -> xs.length.toLong }
    val cTgt = feats.filter(_._2 == TextQueries.DsirTargetLang).flatMap(_._3)
      .groupBy(identity).map { case (f, xs) => f -> xs.length.toLong }
    val nRaw = cRaw.values.sum
    val nTgt = cTgt.values.sum
    feats.foreach { case (id, _, fs) =>
      val s = fs.map(f =>
        (nRaw + 1) / (cRaw(f) + 1) - (nTgt + 1) / (cTgt.getOrElse(f, 0L) + 1)).sum
      val exp = (fs.length.toLong, s, s.toDouble / fs.length.toDouble)
      assert(got(id) == exp, s"doc $id: got ${got(id)}, recomputed $exp")
    }
    // Directionality: target-language docs are target-like on average.
    val byLang = feats.map { case (id, lang, _) => lang -> got(id)._3 }
    def mean(xs: Seq[Double]) = xs.sum / xs.length
    val en = mean(byLang.filter(_._1 == "en").map(_._2).toSeq)
    val other = mean(byLang.filter(_._1 != "en").map(_._2).toSeq)
    assert(en > other, s"mean dsir_score en=$en !> non-en=$other")
  }

  test("d45 tiers recompute from per-source cumulative counts and are monotone in n_tok") {
    val got = TextQueries.d45QualityTiers.run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
    val bySrc = got.groupBy(_._2._1)
    bySrc.foreach { case (src, rows) =>
      val n = rows.length.toLong
      rows.foreach { case (id, (_, nTok, cume, tier)) =>
        val cum = rows.count(_._2._2 <= nTok).toLong
        assert(cume == cum.toDouble / n.toDouble, s"doc $id cume")
        assert(tier == ((cum * TextQueries.TierCount - 1) / n).toInt, s"doc $id tier")
      }
      // Monotone: a doc with more tokens never lands in a lower tier.
      val sorted = rows.sortBy(_._2._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._2._4 <= b._2._4)
        case _ => ()
      }
      assert(rows.map(_._2._4).forall(t => t >= 0 && t < TextQueries.TierCount))
    }
    // Quartiles discriminate: at least one source uses every tier.
    assert(bySrc.values.exists(_.map(_._2._4).distinct.length == TextQueries.TierCount))
  }

  test("e16 keeps ceil(sqrt(size)) hash-ranked members per e08 cluster") {
    import graft.functions.PortableHash.{A, B, P}
    val rows = SimilarityQueries.e16BalancedSample.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getBoolean(4)))
    // Same partition of the corpus as e08 (groups and sizes agree).
    val e08 = SimilarityQueries.e08SemanticClusters.run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { case (v, c, sz, _, _) =>
      assert(e08(v) == ((c, sz)), s"vec $v cluster/size disagree with e08")
    }
    rows.groupBy(_._2).foreach { case (c, ms) =>
      val sz = ms.head._3
      assert(ms.length.toLong == sz)
      val cap = math.ceil(math.sqrt(sz.toDouble)).toLong
      assert(ms.count(_._5).toLong == cap, s"cluster $c kept != ceil(sqrt($sz))")
      // Kept set = lowest (hash, id) ranks, recomputed independently.
      val expKeep = ms.map(_._1)
        .sortBy(v => ((A(5) * (v % P) + B(5)) % P, v)).take(cap.toInt).toSet
      assert(ms.filter(_._5).map(_._1).toSet == expKeep, s"cluster $c keep set")
    }
    // Sublinear: some multi-member cluster drops members.
    assert(rows.exists(r => !r._5), "nothing dropped — no multi-member cluster?")
  }

  test("s26 streaming flags equal the batch LSH rule: flagged iff an earlier doc shares a band") {
    val s26 = StreamingQueries.s26StreamLshDedup.run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // Batch truth: d07's candidate pairs ARE the band collisions, so a doc
    // is flagged exactly when it is the LARGER side of some pair.
    val pairs = TextQueries.d07MinhashPairs.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expFlagged = pairs.map(_._2).toSet
    val gotFlagged = s26.collect { case (id, (_, true)) => id }.toSet
    assert(gotFlagged == expFlagged,
      s"flag sets differ: only-stream=${(gotFlagged -- expFlagged).take(5)}, " +
        s"only-batch=${(expFlagged -- gotFlagged).take(5)}")
    // Every document of the corpus got exactly one verdict; is_dup = n_coll>0.
    assert(s26.size == Tables.load(spark, dir, "documents").count())
    s26.foreach { case (id, (n, dup)) =>
      assert(dup == (n > 0) && n >= 0 && n <= graft.functions.PortableHash.Bands,
        s"doc $id n_coll=$n dup=$dup")
    }
  }

  test("s27 streaming boundaries equal an independent per-shard batch pack") {
    val S = 128L // PackSeqTokens — the training contract this spec pins
    val got = StreamingQueries.s27StreamPack.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getInt(5))).toSet
    // Independent truth: per shard, docs in doc_id order, running offset,
    // segments cut every S tokens — plain Scala, no shared code path.
    val nTok = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val exp = nTok.groupBy(_._1 % StreamingQueries.PackShards).toSeq.flatMap {
      case (shard, ds) =>
        var off = 0L
        ds.sortBy(_._1).flatMap { case (docId, n) =>
          val segs = (off / S to (off + n - 1) / S).map { seq =>
            val gs = math.max(off, seq * S)
            val ge = math.min(off + n, (seq + 1) * S)
            (shard, seq, docId, (gs - seq * S).toInt, gs - off, (ge - gs).toInt)
          }
          off += n
          segs
        }
    }.toSet
    assert(got == exp,
      s"only-stream=${(got -- exp).take(3)}, only-batch=${(exp -- got).take(3)}")
    // Token conservation: per (shard, doc), segment lengths sum to n_tok.
    val byDoc = got.groupBy(x => (x._1, x._3))
      .view.mapValues(_.toSeq.map(_._6.toLong).sum)
    nTok.foreach { case (docId, n) =>
      assert(byDoc((docId % StreamingQueries.PackShards, docId)) == n,
        s"doc $docId: packed ${byDoc.get((docId % StreamingQueries.PackShards, docId))} of $n")
    }
  }

  test("d47 recomputes from d40 x d35 and flags exactly the split-straddling sequences") {
    val got = TextQueries.d47PackLeakage.run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    val seg = TextQueries.d40SequencePack.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(4)))  // seq, doc, tok_len
    val split = TextQueries.d35LeakageSafeSplit.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val exp = seg.groupBy(_._1).map { case (sq, xs) =>
      val tot = xs.map(_._3.toLong).sum
      val ev = xs.filter(x => split(x._2) == "eval").map(_._3.toLong).sum
      sq -> ((tot, ev, ev > 0))
    }
    assert(got == exp)
    // The audit is non-trivial on this corpus: contaminated sequences exist
    // (the packer crosses split boundaries) but are not the whole corpus.
    val n = got.values.count(_._3)
    assert(n > 0 && n < got.size, s"contaminated $n of ${got.size}")
  }

  test("d48 allocations respect the epoch cap and never exceed the uniform share") {
    val rows = TextQueries.d48EpochAlloc.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    val total = rows.map(_._2).sum
    val share = TextQueries.BudgetMult * total / rows.length
    rows.foreach { case (src, stok, alloc, epochs, capped) =>
      assert(alloc == math.min(share, stok * TextQueries.EpochCap), s"$src alloc")
      assert(epochs == alloc.toDouble / stok.toDouble, s"$src epochs")
      assert(capped == (alloc == stok * TextQueries.EpochCap), s"$src capped")
      assert(epochs <= TextQueries.EpochCap.toDouble + 1e-12)
    }
    // The 2x budget in a near-uniform corpus grants >1 epoch everywhere.
    assert(rows.forall(_._4 >= 1.0))
  }

  test("e17 occupancy totals the indexed corpus and flags exactly the capped lists") {
    val rows = SimilarityQueries.e17IndexStats.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val total = rows.map(_._2).sum
    // Every indexed vector sits in exactly one list (postings = assignment,
    // subsampled only above the cap), so shares sum to 1 over the postings.
    assert(rows.map(_._3).sum > 0.999 && rows.map(_._3).sum < 1.001)
    rows.foreach { case (list, n, share, atCap) =>
      assert(n > 0 && n <= SimilarityQueries.CandCap, s"list $list n=$n")
      assert(share == n.toDouble / total.toDouble)
      assert(atCap == (n == SimilarityQueries.CandCap))
    }
    assert(rows.map(_._1).distinct.length == rows.length)
  }

  test("d46 rollup levels are internally consistent and total the corpus") {
    val rows = TextQueries.d46CorpusRollup.run(spark, dir).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val leaves = rows.filter(_._6 == 0L)
    val langs = rows.filter(_._6 == 1L)
    val total = rows.filter(_._6 == 3L)
    assert(total.length == 1 && leaves.nonEmpty && langs.nonEmpty)
    assert(rows.length == leaves.length + langs.length + 1)
    val nDocs = Tables.load(spark, dir, "documents").count()
    assert(total.head._3 == nDocs)
    assert(leaves.map(_._3).sum == nDocs && langs.map(_._3).sum == nDocs)
    langs.foreach { case (lang, _, nd, nt, nc, _) =>
      val mine = leaves.filter(_._1 == lang)
      assert((mine.map(_._3).sum, mine.map(_._4).sum, mine.map(_._5).sum)
        == ((nd, nt, nc)), s"lang $lang leaf sums")
    }
  }
}
