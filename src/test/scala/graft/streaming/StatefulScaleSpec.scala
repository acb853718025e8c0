package graft.streaming

import graft.SparkSpec

/** Pins the state-boundedness claim behind `stream_scale_stateful.json`
  * (VERDICT r13 next #1): for both stateful probe shapes, state-store row
  * counts PLATEAU once the watermark horizon is reached — late batches hold
  * no more state than mid-stream batches, and the plateau is far below the
  * un-evicted total history. Event time advances 30 min per batch against a
  * 2 h watermark, so eviction must start by ~batch 7 of 16. */
class StatefulScaleSpec extends SparkSpec {

  private val Batches = 16
  private val Keys = 50

  test("s05-shaped windowed agg: state plateaus at open-windows x keys, not history") {
    val pts = ScaleProbes.windowProbe(spark, Batches, rows = 1000, keys = Keys)
    assert(pts.size >= Batches,
      s"expected >= $Batches data batches, got ${pts.size}")
    val st = pts.map(_.stateRows)
    // 16 batches x 30 min = 8 h of event time = 8 hourly windows ever; with
    // no eviction state would reach 8 x keys = 400 rows. The watermark keeps
    // <= ~4 windows open, so the plateau sits at <= 5 x keys with margin.
    val windowsEver = Batches / 2
    assert(st.max <= 5L * Keys,
      s"state peaked at ${st.max} rows — watermark is not bounding open windows")
    // Measured plateau: exactly 4 open windows x keys (2 h watermark + 1 h
    // window + the in-progress hour). History would hold windowsEver x keys
    // — at least 2x the plateau at 16 batches, growing without bound after.
    assert(st.last <= 4L * Keys,
      s"final state ${st.last} exceeds the 4-open-window plateau")
    assert(2L * st.last <= windowsEver.toLong * Keys,
      s"final state ${st.last} not separable from history ${windowsEver * Keys}")
    // Plateau: once eviction starts, the tail must not grow — the last
    // quarter's max is no higher than the preceding quarter's max.
    val tail = st.takeRight(Batches / 4)
    val prev = st.dropRight(Batches / 4).takeRight(Batches / 4)
    assert(tail.max <= prev.max,
      s"state still growing at stream end: last-quarter max ${tail.max} > prior ${prev.max}")
  }

  test("s10-shaped stream-stream join: buffered state is watermark-bounded, not history") {
    val rows = 1000
    val pts = ScaleProbes.joinProbe(spark, Batches, rows, keys = Keys)
    assert(pts.size >= Batches,
      s"expected >= $Batches data batches, got ${pts.size}")
    val st = pts.map(_.stateRows)
    val fedTotal = Batches.toLong * (rows + Keys)
    // The 2 h watermark + 1 h lookback keeps <= ~5 batches of each side
    // buffered (join state stores count key-index bookkeeping rows too, so
    // the bound carries a 2x structural margin).
    assert(st.max <= 2L * 6 * (rows + Keys),
      s"join state peaked at ${st.max} rows — watermark is not evicting buffers")
    assert(st.last < fedTotal / 2,
      s"final join state ${st.last} vs $fedTotal fed — holding history")
    val tail = st.takeRight(Batches / 4)
    val prev = st.dropRight(Batches / 4).takeRight(Batches / 4)
    assert(tail.max <= prev.max,
      s"join state still growing at stream end: ${tail.max} > ${prev.max}")
  }
}
