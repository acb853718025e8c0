package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join by coarse bucketing.
  *
  * A naive theta join (`p.d BETWEEN i.sd AND i.ed`) has no equi-key, so
  * Spark plans a nested-loop over every (point, interval) pair — quadratic
  * at scale. Bucketing makes it an equi-join: each interval is exploded to
  * the calendar months it overlaps, each point hashes to its month, the
  * join shuffles on the month key, and the exact containment predicate
  * filters inside the bucket. Work scales with Σ(points × intervals) per
  * month instead of |points| × |intervals| globally; month granularity
  * suits spans of days-to-weeks (pick the granularity near the median span
  * so intervals explode to O(1) buckets).
  */
object RangeJoin {

  /** Inner join of `points` (date column `dCol`) with `intervals`
    * (date columns `sdCol` ≤ `edCol`), keeping point-in-interval pairs. */
  def pointInInterval(points: DataFrame, dCol: String,
                      intervals: DataFrame, sdCol: String, edCol: String): DataFrame =
    intervals
      .withColumn("_bucket", explode(sequence(
        trunc(col(sdCol), "month"), trunc(col(edCol), "month"),
        expr("interval 1 month"))))
      .join(points.withColumn("_bucket", trunc(col(dCol), "month")), Seq("_bucket"))
      .filter(col(sdCol) <= col(dCol) && col(dCol) <= col(edCol))
      .drop("_bucket")
}
