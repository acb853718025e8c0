package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.streaming.{RecallAlertBus, StreamHarness}

/** Crash-replay idempotence for the on-disk streaming state (VERDICT r13
  * next #2): s28's append-merged standing tables and s29's admission
  * register were ARGUED idempotent under `foreachBatch`/state-store replay;
  * these tests pin it with the worst realistic crash — the drain killed
  * mid-feed AND the newest commit record lost (the offset-log/commit-log
  * gap, the same window `RecoverySpec`'s topic-sink test simulates) — then
  * a restart from the same checkpoint, asserting the final state is
  * bit-equal to an uninterrupted run. */
class StreamReplaySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Delete the newest commit record so the restarted query REPLAYS its
    * last completed batch (crash between offset-log and commit-log). */
  private def loseNewestCommit(ckpt: String): Unit = {
    import scala.jdk.CollectionConverters._
    val commits = Paths.get(ckpt, "commits")
    val newest = {
      val s = Files.list(commits)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.forall(_.isDigit)).toSeq.maxBy(_.toLong)
      finally s.close()
    }
    Files.delete(commits.resolve(newest))
    Files.deleteIfExists(commits.resolve(s".$newest.crc"))
  }

  test("s28 standing tables are bit-equal after mid-feed kill + lost-commit replay") {
    def postings(t: StreamingQueries.S28Tables) =
      StreamingQueries.readParts(spark, t.postDir).collect()
        .map(r => (r.getAs[Long]("list"), r.getAs[Long]("nid"),
          r.getAs[scala.collection.Seq[Double]]("nve").toSeq,
          r.getAs[Double]("nnrm"))).toSeq.sorted(
          Ordering.by((x: (Long, Long, Seq[Double], Double)) => (x._1, x._2)))
    def edges(t: StreamingQueries.S28Tables) =
      StreamingQueries.readParts(spark, t.edgeDir).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("nid"),
          r.getAs[Double]("cosine"))).toSeq.sorted
    def probeLists(t: StreamingQueries.S28Tables) =
      StreamingQueries.readParts(spark, t.probeDir).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("list")))
        .toSeq.sorted
    def alerts(t: StreamingQueries.S28Tables) =
      StreamingQueries.readParts(spark, t.alertDir).collect()
        .map(r => (r.getAs[Long]("n_seen"), r.getAs[Long]("n_queries"),
          r.getAs[Double]("mean_recall"), r.getAs[Double]("min_recall"),
          r.getAs[Long]("n_below_floor"), r.getAs[Boolean]("alert")))
        .toSeq.sorted

    RecallAlertBus.drain()
    val clean = StreamingQueries.s28Maintain(spark, dir, monitor = true)
    val cleanPosts = postings(clean)
    assert(RecallAlertBus.drain().size == 2,
      "uninterrupted monitored drain should post one alert per data batch")

    // Crash drive: chunk 1, kill; lose the commit so restart REPLAYS batch
    // 0 through foreachBatch; then feed chunk 2 on the restarted query.
    val crashDrive: StreamingQueries.S28Drive = (src, chunks, ckpt, start) => {
      val q1 = start(src.open(spark))
      try { src.append(chunks.head); q1.processAllAvailable() }
      finally q1.stop()
      loseNewestCommit(ckpt)
      val q2 = start(src.open(spark))
      try chunks.tail.foreach { c => src.append(c); q2.processAllAvailable() }
      finally q2.stop()
    }
    val crashed = StreamingQueries.s28Maintain(spark, dir, monitor = true,
      drive = Some(crashDrive))
    // The replay genuinely happened: batch 0 ran twice, so three alert
    // posts, not two — and the standing tables still came out identical.
    assert(RecallAlertBus.drain().size == 3,
      "lost-commit restart did not replay the first batch")

    assert(postings(crashed) == cleanPosts, "postings diverged under replay")
    assert(edges(crashed) == edges(clean), "candidate edges diverged under replay")
    assert(probeLists(crashed) == probeLists(clean), "probe lists diverged under replay")
    assert(alerts(crashed) == alerts(clean), "alert log diverged under replay")
    assert(cleanPosts.nonEmpty, "vacuous: no admissions in the clean run")
  }

  test("s28 tiered merge batch is replay-idempotent and actually compacts (kill at the boundary)") {
    // 5 chunks at compactEvery = 2 drive the FULL tiered cascade (VERDICT
    // r16 next #5): batch 2 folds b0–b1 into g1_0_2, batch 4 folds b2–b3
    // into g1_2_4 AND immediately merges both level-1 runs into g2_0_4 —
    // a level-0 fold and a level-1→2 merge in the same batch, the round's
    // new crash window. The kill loses batch 4's commit AFTER the drain
    // finished, so the restart REPLAYS the tiered-merge batch:
    // maybeCompactParts must converge against the existing g2_0_4 (folds
    // are pure functions of the surviving listing) and the recomputed b4
    // must come out bit-equal. The seed is asserted PRESENT — tiered
    // compaction never rewrites the standing base (that was the r16
    // full-compaction O(total) spike this design removes).
    val chunksN = 5
    val compactEvery = 2
    def tableRows(d: String): Seq[Seq[Any]] =
      StreamingQueries.readParts(spark, d).collect()
        .map(_.toSeq.toSeq).toSeq.sortBy(_.mkString("|"))
    def partNames(d: String): Seq[String] = {
      val p = java.nio.file.Paths.get(d)
      import scala.jdk.CollectionConverters._
      val s = Files.list(p)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => !n.startsWith(".") && !n.startsWith("_")).toSeq.sorted
      finally s.close()
    }

    RecallAlertBus.drain()
    val clean = StreamingQueries.s28Maintain(spark, dir, monitor = true,
      chunksN = chunksN, compactEvery = compactEvery)
    assert(RecallAlertBus.drain().size == chunksN)
    // Discrimination: the cascade really merged — each standing table is
    // the untouched seed, ONE level-2 run covering batches 0–3 (the
    // intermediate level-1 runs swept), and the last batch's own part.
    for (d <- Seq(clean.postDir, clean.probeDir, clean.edgeDir))
      assert(partNames(d) == Seq("b4", "g2_0_4", "seed"),
        s"expected tiered layout [b4, g2_0_4, seed] under $d, got ${partNames(d)}")
    val cleanRows = Seq(clean.postDir, clean.probeDir, clean.edgeDir,
      clean.alertDir).map(tableRows)

    val crashDrive: StreamingQueries.S28Drive = (src, chunks, ckpt, start) => {
      val q1 = start(src.open(spark))
      try chunks.foreach { c => src.append(c); q1.processAllAvailable() }
      finally q1.stop()
      loseNewestCommit(ckpt) // batch 4 — the compaction batch — replays
      val q2 = start(src.open(spark))
      try q2.processAllAvailable()
      finally q2.stop()
    }
    val crashed = StreamingQueries.s28Maintain(spark, dir, monitor = true,
      chunksN = chunksN, compactEvery = compactEvery, drive = Some(crashDrive))
    assert(RecallAlertBus.drain().size == chunksN + 1,
      "lost-commit restart did not replay the tiered-merge batch")
    for (d <- Seq(crashed.postDir, crashed.probeDir, crashed.edgeDir))
      assert(partNames(d) == Seq("b4", "g2_0_4", "seed"),
        s"replayed drain layout diverged under $d: ${partNames(d)}")
    val crashedRows = Seq(crashed.postDir, crashed.probeDir, crashed.edgeDir,
      crashed.alertDir).map(tableRows)
    for (((c, r), what) <- cleanRows.zip(crashedRows)
        .zip(Seq("postings", "probe lists", "edges", "alerts")))
      assert(c == r, s"$what diverged under compaction-boundary replay")
    assert(cleanRows.head.nonEmpty, "vacuous: no admissions in the clean run")
  }

  test("partPaths fails loudly on a replay below a compacted fold (ADVICE r16)") {
    val d = StreamHarness.tempDir("deep-replay")
    val df = spark.range(4).selectExpr("id AS v")
    for (k <- 0 until 4)
      df.filter(col("v") === k).write.mode("overwrite").parquet(s"$d/b$k")
    StreamingQueries.maybeCompactParts(spark, d, 4L, every = 4)
    // Normal replay AT the fold boundary still reads exactly batches 0–3.
    val ok = StreamingQueries.readParts(spark, d, Some(4L))
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(ok == Seq(0L, 1L, 2L, 3L), s"fold changed the visible rows: $ok")
    // A DEEPER replay (batch 2 is inside g1_0_4, whose input parts were
    // deleted after the fold) must fail loudly — before this guard the
    // partial part set was returned silently, dropping batches 2–3's
    // absence from the caller's view (ADVICE r16).
    val e = intercept[IllegalArgumentException] {
      StreamingQueries.partPaths(spark, d, Some(2L))
    }
    assert(e.getMessage.contains("replay below a compacted fold"),
      s"wrong failure: ${e.getMessage}")
  }

  test("s29 admission register survives lost-commit replay + restart with identical emissions") {
    implicit val ctx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    implicit val enc: org.apache.spark.sql.Encoder[String] =
      org.apache.spark.sql.Encoders.STRING
    val textA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val textB = "one two three four five six seven eight nine ten"
    val batch0 = Seq(s"10|$textA", s"11|$textB")
    // 20 duplicates 10's text: its collision verdict EXISTS only if the
    // batch-0 register state survived the crash/restart.
    val batch1 = Seq(s"20|$textA", s"21|completely different words here now")

    def run(crash: Boolean): Seq[(Long, Int, Int, Boolean, Boolean)] = {
      val mem = {
        org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
      }
      val out = StreamHarness.tempDir("s29-replay-out")
      val ckpt = StreamHarness.checkpointDir("s29-replay")
      def start() = StreamingQueries.s29Admission(mem.toDF())
        .writeStream
        .option("checkpointLocation", ckpt)
        // Idempotent collector: per-batch part dirs, overwrite — the same
        // replay discipline the s28 tables use, so a replayed batch cannot
        // double its emissions in the collected set.
        .foreachBatch { (b: DataFrame, id: Long) =>
          b.write.mode("overwrite").parquet(s"$out/b$id")
        }
        .outputMode("append").start()
      val q1 = start()
      mem.addData(batch0: _*)
      q1.processAllAvailable()
      q1.stop()
      if (crash) loseNewestCommit(ckpt)
      val q2 = start()
      mem.addData(batch1: _*)
      q2.processAllAvailable()
      q2.stop()
      spark.read.parquet(s"$out/b*").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("modality"),
          r.getAs[Int]("band"), r.getAs[Boolean]("cand"),
          r.getAs[Boolean]("collided"))).toSeq.sorted
    }

    val clean = run(crash = false)
    val crashed = run(crash = true)
    assert(crashed == clean,
      "s29 emissions diverged under lost-commit replay")
    // Discrimination: the cross-batch duplicate was actually flagged from
    // recovered state — doc 20 collides on every text band.
    val doc20Text = clean.filter(r => r._1 == 20L && r._2 == 0)
    assert(doc20Text.nonEmpty && doc20Text.forall(_._5),
      s"doc 20 should text-collide via the recovered register: $doc20Text")
    // And the control doc does not.
    val doc21Text = clean.filter(r => r._1 == 21L && r._2 == 0)
    assert(doc21Text.nonEmpty && doc21Text.forall(!_._5),
      s"doc 21 should not collide: $doc21Text")
  }
}
