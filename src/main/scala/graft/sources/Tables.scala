package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

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
    *  - `spark.sql.legacy.parquet.nanosAsLong = true` — `events.ts` is a
    *    nanosecond parquet timestamp, which Spark 4 rejects by default; we
    *    read raw nanos and truncate to micros in [[load]], exactly what
    *    DuckDB does on read (TIMESTAMP_NS → TIMESTAMP).
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
    if (name == "events") {
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}
