package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Idempotent keyed upsert sink over parquet — the Spark-native replacement
  * for the reference's Cassandra PK-overwrite tables (K1 `user_details`,
  * K2 `sales`, K3 `latest_location`; reference
  * `IOTSparkStreaming.scala:68-69,76,166`), designed for `foreachBatch`.
  *
  * Storage, idempotence, and GC live in [[BucketedSnapshotSink]]; this
  * class supplies the register discipline: **last-write-wins by version,
  * not by arrival**. The caller names a set of ordering columns; the
  * surviving row per key is the max by that ordering across the bucket's
  * snapshot and the incoming batch. The result is independent of
  * micro-batch boundaries AND of replay — reprocessing a batch after
  * checkpoint recovery converges to the same snapshot (the reference is
  * only at-least-once, SURVEY.md §2.7; this is effectively exactly-once).
  *
  * Scale: the merge shuffles (touched buckets ∪ batch) once on the upsert
  * key; the touched-bucket set itself is metadata (≤ nBuckets ints). On a
  * real cluster `nBuckets` is sized so one bucket's keys fit an executor
  * comfortably (e.g. total keys / ~10M).
  */
final class UpsertSink(path: String, keyCols: Seq[String], orderCols: Seq[String],
                       nBuckets: Int = 16)
    extends BucketedSnapshotSink(path, keyCols, nBuckets) {

  /** Dedupe to max-by-ordering per key across (bucket snapshot ∪ batch). */
  override protected def merge(prev: Option[DataFrame], batch: DataFrame): DataFrame = {
    val merged = prev.map(_.unionByName(batch)).getOrElse(batch)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc): _*)
    merged
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}
