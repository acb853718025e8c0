package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** q48's runtime-filter contract: the Bloom prune must be invisible in the
  * RESULT (no false negatives, false positives scrubbed by the exact semi
  * join) and visible in the ROW COUNT reaching the join (the prune is the
  * point — it is what keeps the fact shuffle proportional to matches, not
  * to the scan, at scale). */
class BloomPruneSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bloom-pruned semi join is result-identical to the plain semi join") {
    val got = RelationalQueries.q48BloomSemiJoin.run(spark, dir).collect().toSeq
    val li = Tables.load(spark, dir, "lineitem")
    val part = Tables.load(spark, dir, "part")
      .filter(col("p_brand") === "Brand#13").select(col("p_partkey"))
    val expect = li
      .join(part, li("l_partkey") === part("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_lines"),
        graft.functions.Deterministic.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_partkey"))
      .collect().toSeq
    assert(got.nonEmpty)
    assert(got == expect)
  }

  test("the bloom rejects most non-matching fact rows before the join") {
    // Run the query once so it registers graft_bloom_q48 for this session.
    RelationalQueries.q48BloomSemiJoin.run(spark, dir).collect()
    val li = Tables.load(spark, dir, "lineitem")
    val total = li.count()
    val passed = li
      .filter(call_function("graft_bloom_q48", col("l_partkey"))).count()
    val matches = li.join(
      Tables.load(spark, dir, "part")
        .filter(col("p_brand") === "Brand#13").select(col("p_partkey")),
      li("l_partkey") === col("p_partkey"), "left_semi").count()
    assert(passed >= matches, "bloom produced a false negative")
    // ~1/25 of parts carry the brand; fpp 0.01 adds ~1% of the rest. The
    // prune must strip the vast majority of the scan before any shuffle.
    assert(passed <= total / 5,
      s"bloom passed $passed of $total rows — prune ineffective")
  }
}
