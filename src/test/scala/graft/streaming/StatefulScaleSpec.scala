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

  /** Per-batch envelope bands (VERDICT r15 next #4): the measured hdfs/4
    * single-box ceiling (`stream_scale_stateful.json` r15: window medians
    * 353–554 ms, join medians 696–1183 ms across the 9 rows×keys cells)
    * pinned as a FLOOR statistic — the minimum steady-state batch time.
    * Suite-run contention spikes individual batches (observed medians
    * swinging 1004→2563 ms across back-to-back runs), but noise only ADDS
    * time: over 14 steady batches the minimum is stable, while a real
    * state-commit-cost regression lifts every batch including it. Bands sit
    * ~2.5× over the quiet floor, so a doubled-plus commit cost fails here
    * instead of hiding until the next 63-cell artifact. The first two
    * batches are excluded (query start-up: source init + state-store open,
    * paid once per deployment). */
  private val WindowMinBandMs = 900L
  private val JoinMinBandMs = 1800L
  private def steadyMinMs(pts: Seq[ScaleProbes.BatchPoint]): Long =
    pts.drop(2).map(_.ms).min

  /** The wall-clock envelope bands are opt-in (ADVICE r16): they encode
    * THIS box's measured quiet floor, so on unknown/contended hardware a
    * correct build could fail a functional run. Functional CI always checks
    * the state-row plateaus; quiet-box measurement runs set
    * SPARK_GRAFT_PERF_ENVELOPE=1 to enforce the latency bands too (the
    * values are info-logged either way, so every run still records them). */
  private val enforceEnvelope =
    sys.env.get("SPARK_GRAFT_PERF_ENVELOPE").contains("1")
  private def checkEnvelope(what: String, steadyMin: Long, band: Long,
      detail: String): Unit =
    if (enforceEnvelope)
      assert(steadyMin <= band,
        s"$what per-batch floor $steadyMin ms breached the $band ms " +
          s"single-box envelope ($detail)")
    else if (steadyMin > band)
      info(s"$what floor $steadyMin ms above the $band ms quiet-box band " +
        "(not enforced: SPARK_GRAFT_PERF_ENVELOPE unset)")

  test("s05-shaped windowed agg: state plateaus at open-windows x keys, not history") {
    // Untimed warmup drain: this is the suite's first streaming query in a
    // fresh forked JVM, so without it the whole measured drain runs while
    // Spark itself is still JITing (observed floor 1284 ms cold vs 446 ms
    // warm) — a deployment's steady state is the warm number.
    ScaleProbes.windowProbe(spark, batches = 4, rows = 100, keys = 10)
    val pts = ScaleProbes.windowProbe(spark, Batches, rows = 1000, keys = Keys)
    assert(pts.size >= Batches,
      s"expected >= $Batches data batches, got ${pts.size}")
    info(s"window steady min: ${steadyMinMs(pts)} ms (band $WindowMinBandMs)")
    checkEnvelope("windowed-agg", steadyMinMs(pts), WindowMinBandMs,
      "r15 measured medians 353-554 ms")
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
    info(s"join steady min: ${steadyMinMs(pts)} ms (band $JoinMinBandMs)")
    checkEnvelope("stream-stream join", steadyMinMs(pts), JoinMinBandMs,
      "r15 measured medians 696-1183 ms")
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
