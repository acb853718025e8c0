package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SCD2 register semantics: change compression, version close-out across
  * batches, immutable closed history, replay idempotence, and independence
  * from micro-batch boundaries. */
class Scd2SinkSpec extends SparkSpec {

  private def updates(rows: (String, Long, Int)*): DataFrame = {
    import spark.implicits._
    rows.toDF("user_id", "seq", "v")
  }

  private def fresh() = new Scd2Sink(
    StreamHarness.tempDir("scd2-spec"), Seq("user_id"), "seq", Seq("v"))

  private def history(sink: Scd2Sink): Seq[(String, Int, Long, Option[Long], Boolean)] =
    sink.snapshot(spark).get
      .select(col("user_id"), col("v"), col("valid_from"), col("valid_to"),
        col("is_current"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
      .toSeq.sortBy(t => (t._1, t._3))

  test("changes open versions, equal values compress, history closes out") {
    val sink = fresh()
    sink.upsert(updates(("u1", 1L, 10), ("u1", 2L, 10), ("u1", 3L, 20)), 0L)
    assert(history(sink) == Seq(
      ("u1", 10, 1L, Some(3L), false), // seq=2 compressed into [1,3)
      ("u1", 20, 3L, None, true)))
  }

  test("a later batch closes the open version; closed rows are untouched") {
    val sink = fresh()
    sink.upsert(updates(("u1", 1L, 10), ("u1", 5L, 20)), 0L)
    sink.upsert(updates(("u1", 9L, 20), ("u1", 12L, 30), ("u2", 2L, 7)), 1L)
    assert(history(sink) == Seq(
      ("u1", 10, 1L, Some(5L), false),
      ("u1", 20, 5L, Some(12L), false), // seq=9 same value: no new version
      ("u1", 30, 12L, None, true),
      ("u2", 7, 2L, None, true)))
  }

  test("result is independent of micro-batch boundaries") {
    val rows = Seq(("u1", 1L, 10), ("u1", 4L, 20), ("u1", 6L, 20),
      ("u1", 9L, 10), ("u2", 3L, 5), ("u2", 8L, 6))
    val oneShot = fresh()
    oneShot.upsert(updates(rows: _*), 0L)
    val perRow = fresh()
    rows.zipWithIndex.foreach { case (r, i) => perRow.upsert(updates(r), i.toLong) }
    assert(history(oneShot) == history(perRow))
  }

  test("replayed batches are no-ops (marker) and re-merges converge (content)") {
    val sink = fresh()
    val b0 = updates(("u1", 1L, 10), ("u1", 5L, 20))
    sink.upsert(b0, 0L)
    val before = history(sink)
    sink.upsert(b0, 0L) // marker short-circuit
    assert(history(sink) == before)
    sink.upsert(b0, 1L) // same rows under a NEW id: equal (seq,v) compress away
    assert(history(sink) == before)
  }
}
