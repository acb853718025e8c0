package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet-backed table catalog over a scale-factor directory
  * (`/root/testdata/sf*`, see TESTDATA.md).
  *
  * Plays the role the Cassandra keyspace plays in the reference
  * (`cassTest.scala:28`, `workingTest.scala:46`): named persistent tables.
  * Loading through `spark.read.parquet` keeps scans declarative so Catalyst
  * applies column pruning + predicate pushdown into the parquet reader —
  * the automatic equivalent of the reference's hand-written
  * `.select("user_id","category")` projection (`workingTest.scala:77-78`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session contract for every query entry path, applied once per session:
    *
    *  - `spark.sql.session.timeZone = UTC` — all `date_format`/`strftime`
    *    renderings of LTZ timestamps must agree with the DuckDB oracle's
    *    naive-timestamp formatting, which holds only in UTC. Enforced here
    *    (not just in Verify/Bench) so a driver-built session in a non-UTC
    *    JVM cannot silently shift dates.
    *  - `spark.sql.legacy.parquet.nanosAsLong = true` — if `events.ts` is a
    *    nanosecond parquet timestamp (one of the physical encodings the
    *    upstream writer has used), Spark 4 rejects it by default; with this
    *    conf it reads as BIGINT nanos and [[load]] truncates to micros,
    *    exactly what DuckDB does on read (TIMESTAMP_NS → TIMESTAMP). For
    *    other encodings the conf is inert.
    *
    * Both settings are constant, so repeated application is a no-op — unlike
    * the r1 design, this is the documented invariant of the catalog rather
    * than a hidden per-table side effect.
    */
  def prepare(spark: SparkSession): Unit = {
    if (!spark.conf.getOption("spark.sql.session.timeZone").contains("UTC"))
      spark.conf.set("spark.sql.session.timeZone", "UTC")
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.functions.expr.HashExpressions.register(spark)
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    prepare(spark)
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  /** Adapt `events.ts` to session-local `TIMESTAMP` whatever physical
    * encoding the parquet writer used. The upstream generator has shipped
    * this column as int64 nanos (read as BIGINT under `nanosAsLong`),
    * `timestamp[us]` without timezone (read as TIMESTAMP_NTZ), and
    * `timestamp[us]` with UTC timezone (read as TIMESTAMP) across vintages —
    * a real lakehouse sees exactly this kind of drift across partition
    * vintages, so the catalog branches on the type it actually read instead
    * of baking in one encoding. All three branches are value-identical to
    * DuckDB's read of the same file under the UTC session pinned in
    * [[prepare]].
    */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => // int64 nanos via spark.sql.legacy.parquet.nanosAsLong
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => // naive micros; UTC session makes this exact
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported physical type $other (expected " +
            "int64-nanos BIGINT, TIMESTAMP_NTZ, or TIMESTAMP)")
    }
}
