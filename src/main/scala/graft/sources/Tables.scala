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

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is a nanosecond parquet timestamp, which Spark 4 rejects
      // by default. Read it as raw nanos and truncate to micros — exactly
      // what DuckDB does on read (TIMESTAMP_NS → TIMESTAMP), so the oracle
      // sees identical values.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}
