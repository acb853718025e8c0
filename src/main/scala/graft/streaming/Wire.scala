package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's CSV wire formats (SURVEY.md §1.3) as explicit Spark
  * schemas, plus a deterministic renderer that turns the driver `events`
  * table into multiplexed raw lines — the stand-in for the reference's Kafka
  * byte stream (`IOTSparkStreaming.scala:43-46`) in this zero-egress env.
  *
  * Schemas are `StructType` objects (the reference hard-codes field
  * positions, §1.3); parsing is `from_csv` in PERMISSIVE mode with an
  * explicit corrupt-record column — the reference instead crashes the batch
  * on a malformed line (`NumberFormatException` at
  * `IOTSparkStreaming.scala:53`; SURVEY.md §2.7), so the policy here is a
  * deliberate, documented improvement.
  */
object Wire {

  /** `fitbit` topic layout (reference `IOTSparkStreaming.scala:119-126`):
    * tag, event ts, user, lat, long, pulse, temp, age, bp category,
    * machine ts. lat/long/user/machine_ts stay strings end-to-end exactly
    * like the reference (§1.2). */
  val FitbitSchema: StructType = StructType(Seq(
    StructField("rtype", StringType),
    StructField("ts_str", StringType),
    StructField("user_id", StringType),
    StructField("lat", StringType),
    StructField("long", StringType),
    StructField("pulse", DoubleType),
    StructField("temp", DoubleType),
    StructField("age", IntegerType),
    StructField("bp_cat", StringType),
    StructField("machine_ts", StringType),
    StructField("_corrupt", StringType)))

  /** `new-user-notification` layout (reference `IOTSparkStreaming.scala:52-64`). */
  val NewUserSchema: StructType = StructType(Seq(
    StructField("rtype", StringType),
    StructField("age", IntegerType),
    StructField("gender", StringType),
    StructField("category", StringType),
    StructField("weight", DoubleType),
    StructField("height", DoubleType),
    StructField("bmi", DoubleType),
    StructField("bfp", DoubleType),
    StructField("bp_cat", StringType),
    StructField("bp_sys", DoubleType),
    StructField("bp_dia", DoubleType),
    StructField("user_id", StringType),
    StructField("device_id", StringType),
    StructField("_corrupt", StringType)))

  /** `sales` layout (reference `IOTSparkStreaming.scala:73-75`). */
  val SalesSchema: StructType = StructType(Seq(
    StructField("rtype", StringType),
    StructField("date", StringType),
    StructField("count", IntegerType),
    StructField("_corrupt", StringType)))

  /** `sales` layout carrying the transport offset as a 4th field (s13): the
    * reference's register semantics are "last Kafka record wins", an order
    * only the broker's record offset makes explicit. Threading that offset
    * onto the wire gives the upsert register a monotone version column, so
    * it reproduces last-write-wins exactly and independently of batch
    * boundaries (the base 3-field wire can only support the deterministic
    * MAX-per-date register, s07). */
  val SalesSchemaV2: StructType = StructType(Seq(
    StructField("rtype", StringType),
    StructField("date", StringType),
    StructField("count", IntegerType),
    StructField("seq", LongType),
    StructField("_corrupt", StringType)))

  /** `scd` layout (s21): key, tracked value, and the transport seq — the
    * minimal CDC wire for a versioned dimension register ([[Scd2Sink]]).
    * Like [[SalesSchemaV2]], the seq rides the wire because validity ranges
    * are defined by log order, which only the transport offset makes
    * explicit. */
  val ScdSchema: StructType = StructType(Seq(
    StructField("rtype", StringType),
    StructField("user_id", StringType),
    StructField("v", IntegerType),
    StructField("seq", LongType),
    StructField("_corrupt", StringType)))

  private val CsvOpts = Map(
    "mode" -> "PERMISSIVE",
    "columnNameOfCorruptRecord" -> "_corrupt")

  /** Tag-field demultiplex (P1, reference `IOTSparkStreaming.scala:46`):
    * first CSV field selects the logical stream. */
  def tagOf(line: Column): Column = split(line, ",").getItem(0)

  /** Parse a raw-line column with a per-topic schema (PERMISSIVE; malformed
    * lines land in `_corrupt` instead of killing the batch). */
  def parseCsv(line: Column, schema: StructType): Column =
    from_csv(line, schema, CsvOpts)

  /** Deterministic fitbit-line rendering of the `events` table. Every field
    * is integer-derived or an exact double→string→double round trip, so a
    * DuckDB oracle can predict the parsed values without string handling:
    *
    * {{{ fitbit,<yyyy-MM-dd HH:mm:ss>,<user_id>,<lat>,<long>,<pulse>,<temp>,<age>,<bp_cat>,<machine_ts> }}}
    *
    * lat = user_id % 90, long = event_id % 180, pulse/temp = value,
    * age = user_id % 60 + 18 (the q04 convention), bp_cat = event_type,
    * machine_ts = epoch millis. The pulse field is overridable so corrupt-
    * line fixtures (c01) stay in lockstep with this layout. */
  def fitbitLine: Column = fitbitLineWith(col("value").cast("string"))

  def fitbitLineWith(pulseField: Column): Column = concat_ws(",",
    lit("fitbit"),
    date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
    col("user_id").cast("string"),
    (col("user_id") % 90).cast("string"),
    (col("event_id") % 180).cast("string"),
    pulseField,
    col("value").cast("string"),
    (col("user_id") % 60 + 18).cast("string"),
    col("event_type"),
    unix_millis(col("ts")).cast("string"))

}
