package graft.queries

import graft.SparkSpec

/** Pins the measurement seams round 15 added for the scale tools (VERDICT
  * r14 next #2/#3/#5), so the numbers those tools commit are numbers about
  * the REGISTERED operators, not about drifted copies:
  *
  *  - [[SimilarityQueries.e03Frame]] / [[RelationalQueries.q40Frame]] cut
  *    variants must stay value-equal to the registered query (the
  *    attribution decomposes the same pipeline, or it attributes nothing);
  *  - [[StreamingQueries.s28Maintain]]'s phase sink must report every
  *    phase for every non-empty micro-batch, and `chunksN` must control
  *    the drain's batch count (the maintenance scale probe's two knobs);
  *  - [[SimilarityQueries.BuildPhases]] must cover the graph build with
  *    its three phases summing ≈ the total the bench quotes.
  */
class ScaleToolSeamsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("e03Frame unsorted is the registered e03 minus only the sort") {
    val full = SimilarityQueries.e03Frame(spark, dir).collect()
    val unsorted = SimilarityQueries.e03Frame(spark, dir, sorted = false)
      .collect().sortBy(_.getLong(0))
    assert(full.toSeq == unsorted.toSeq)
  }

  test("q40Frame cuts nest: full = window + re-sort, window ⊇ scan columns") {
    val full = RelationalQueries.q40Frame(spark, dir).collect()
    val window = RelationalQueries.q40Frame(spark, dir, "window")
      .collect().sortBy(_.getLong(0))
    assert(full.toSeq == window.toSeq)
    val scanCols = RelationalQueries.q40Frame(spark, dir, "scan").columns.toSeq
    assert(scanCols == Seq("o_orderkey", "o_orderpriority", "o_totalprice"))
    assert(RelationalQueries.q40Frame(spark, dir).columns.take(3).toSeq == scanCols)
  }

  test("s28 phase sink reports each phase per batch; chunksN sets batch count") {
    val buf = new scala.collection.mutable.ArrayBuffer[(Long, String, Double)]()
    val sink = (id: Long, phase: String, sec: Double) =>
      buf.synchronized { buf += ((id, phase, sec)); () }
    StreamingQueries.s28Maintain(spark, dir, monitor = true, chunksN = 4,
      phaseSink = Some(sink))
    val byBatch = buf.groupBy(_._1)
    // 4 chunks can drain over >= 4 non-empty triggers (an appended chunk
    // may split); every reported batch must carry the full phase set.
    assert(byBatch.size >= 4, s"expected >=4 batches, got ${byBatch.size}")
    val want =
      Set("compact", "route_admit", "edges", "post_probe", "monitor", "total")
    byBatch.foreach { case (id, rows) =>
      assert(rows.map(_._2).toSet == want, s"batch $id phases ${rows.map(_._2)}")
      val ph = rows.map(r => r._2 -> r._3).toMap
      // total covers the phases it wraps (allow scheduler slack, no gap
      // bigger than 50% — the phases are cut at the action boundaries).
      assert(ph("total") >= (ph - "total").values.sum * 0.5)
    }
  }

  test("BuildPhases splits the graph build into three phases summing to ~total") {
    val total = SimilarityQueries.timeGraphBuild(spark, dir)
    val ph = SimilarityQueries.BuildPhases.snapshot
    assert(Set("prepare", "train", "assign_write").subsetOf(ph.keySet), ph.toString)
    val sum = ph("prepare") + ph("train") + ph("assign_write")
    assert(sum <= total + 0.1, s"phases $sum exceed total $total")
    assert(sum >= total * 0.6, s"phases $sum cover too little of total $total")
  }
}
