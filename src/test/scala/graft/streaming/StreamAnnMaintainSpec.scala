package graft.streaming

import graft.SparkSpec
import graft.queries.{SimilarityQueries, StreamingQueries}

/** s28's contract (VERDICT r11 next #2): the STREAMED append-merge — arrivals
  * routed through the frozen router in foreachBatch, postings and probe
  * lists append-merged across micro-batches — must equal e13's BATCH merge
  * on the same held-out split, bit-for-bit. Equality is a theorem of the
  * prefix-monotone (arrival-order) increment cap plus the two-sided edge
  * emission (probe-on-arrival + backfill-on-admission); this spec pins it
  * end-to-end over a real multi-micro-batch drain, so any future change
  * that silently breaks the invariant (a hash-order cap, a missed backfill
  * direction, a cosine computed with a different fold) fails loudly.
  */
class StreamAnnMaintainSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streamed ANN maintenance equals e13's batch merge bit-for-bit") {
    val streamed = StreamingQueries.s28StreamAnnMaintain.run(spark, dir).collect()
    val batch = SimilarityQueries.e13IncrementalIndex.run(spark, dir).collect()
    assert(streamed.length == batch.length,
      s"row counts differ: streamed ${streamed.length} vs batch ${batch.length}")
    streamed.zip(batch).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g == e, s"row $i differs: streamed $g vs batch $e")
    }
    // The merge actually covers the appended increment (is_new rows exist
    // and carry neighbors), so the equality above is not vacuous.
    val newRows = streamed.count(_.getInt(4) == 1)
    assert(newRows > 0, "no appended-vector rows in the merged graph")
  }
}
