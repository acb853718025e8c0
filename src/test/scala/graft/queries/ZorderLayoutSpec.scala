package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Drives q49's write-path layout claim: range-partitioning by the Morton
  * key produces files whose min/max envelopes are tight in BOTH scan dims,
  * where a 1-D time sort leaves the user dim unbounded. The measured
  * contract is the one parquet row-group pruning actually exercises: for a
  * single-dim range predicate, how many file envelopes intersect it? A
  * time-sorted layout answers "all of them" for user predicates; Z-order
  * keeps the worst dim bounded — that balance, not total envelope area
  * (which a 1-D sort can match on a fixed file budget), is what the
  * interleave buys. */
class ZorderLayoutSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val Files = 16

  /** Per-file (min_x, max_x, min_y, max_y) envelopes after writing `df`
    * range-partitioned + sorted by `key` — what parquet footer stats would
    * carry for pruning. */
  private def envelopes(df: org.apache.spark.sql.DataFrame, key: String): Seq[(Long, Long, Long, Long)] = {
    val out = graft.streaming.StreamHarness.tempDir(s"zorder-$key")
    df.repartitionByRange(Files, col(key)).sortWithinPartitions(col(key))
      .write.mode("overwrite").parquet(out)
    spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
  }

  /** Mean number of file envelopes a 16-wide window predicate on one dim
    * intersects, averaged over the windows covering [0, hi). */
  private def meanFilesHit(envs: Seq[(Long, Long, Long, Long)], onX: Boolean, hi: Long): Double = {
    val windows = (0L until hi by 16).map(lo => (lo, lo + 15))
    val hits = windows.map { case (lo, whi) =>
      envs.count { case (x0, x1, y0, y1) =>
        val (a, b) = if (onX) (x0, x1) else (y0, y1)
        a <= whi && b >= lo
      }
    }
    hits.sum.toDouble / windows.size
  }

  test("z-order bounds the worst dim; a time sort answers user predicates with every file") {
    val ev = Tables.load(spark, dir, "events")
      .select((col("user_id") % 256).as("x"),
        expr("unix_millis(ts) div 10800000 % 256").as("y"))
    // Same key arithmetic as q49 (private there; 8-bit interleave).
    val z = (0 until 8).map { i =>
      shiftright(col("x"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(col("y"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

    val zEnv = envelopes(ev.withColumn("zkey", z), "zkey")
    val tEnv = envelopes(ev.withColumn("tkey", col("y")), "tkey")
    assert(zEnv.size == Files && tEnv.size == Files)

    // sf0.01 dims: x covers 0..149, y covers 0..239.
    val (zx, zy) = (meanFilesHit(zEnv, onX = true, 150), meanFilesHit(zEnv, onX = false, 240))
    val (tx, ty) = (meanFilesHit(tEnv, onX = true, 150), meanFilesHit(tEnv, onX = false, 240))
    info(f"files hit per 16-wide window: z x=$zx%.1f y=$zy%.1f | time-sort x=$tx%.1f y=$ty%.1f")
    // Time sort: y-windows prune hard, x-windows hit EVERY file.
    assert(tx >= Files - 1, s"time-sort x predicates unexpectedly selective ($tx)")
    // Z-order: both dims prune — the worst dim stays well under the full
    // file count, so no predicate class degenerates to a full scan. (The
    // bound is 10/16 not 8/16 because sf0.01's x only covers 0..149 of the
    // 8-bit range: partially-empty x-quarters widen file envelopes.)
    assert(zx <= Files * 10 / 16.0, s"z-layout x predicates hit $zx of $Files files")
    assert(zy <= Files * 10 / 16.0, s"z-layout y predicates hit $zy of $Files files")
    assert(math.max(zx, zy) < math.max(tx, ty),
      s"z worst-dim ${math.max(zx, zy)} not better than time-sort worst-dim ${math.max(tx, ty)}")
  }

  test("q49 tile contract: every 16x16 tile bounds both dims to a span of 15") {
    val tiles = RelationalQueries.q49ZorderLayout.run(spark, dir).collect()
    assert(tiles.nonEmpty)
    tiles.foreach { r =>
      val (tile, sx, sy) = (r.getLong(0), r.getLong(3) - r.getLong(2), r.getLong(5) - r.getLong(4))
      assert(sx <= 15 && sx >= 0, s"tile $tile x-span $sx outside [0,15]")
      assert(sy <= 15 && sy >= 0, s"tile $tile y-span $sy outside [0,15]")
    }
  }
}
