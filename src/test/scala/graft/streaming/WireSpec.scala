package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The CSV wire layer: per-topic typed parse + the PERMISSIVE malformed-line
  * contract the streaming queries rely on (SURVEY.md §1.3, §2.7). */
class WireSpec extends SparkSpec {

  private def parseOne(line: String) = {
    import spark.implicits._
    Seq(line).toDF("value")
      .select(Wire.parseCsv(col("value"), Wire.FitbitSchema).as("r"))
      .select(col("r.*")).head()
  }

  test("valid fitbit line parses into the typed positional schema") {
    val r = parseOne("fitbit,2024-01-01 00:00:07,8,12,34,6.55,36.6,26,HYP_1,1704067207179")
    assert(r.getAs[String]("rtype") == "fitbit")
    assert(r.getAs[String]("ts_str") == "2024-01-01 00:00:07")
    assert(r.getAs[String]("user_id") == "8")
    assert(r.getAs[String]("lat") == "12" && r.getAs[String]("long") == "34")
    assert(r.getAs[Double]("pulse") == 6.55 && r.getAs[Double]("temp") == 36.6)
    assert(r.getAs[Int]("age") == 26)
    assert(r.getAs[String]("bp_cat") == "HYP_1")
    assert(r.getAs[String]("machine_ts") == "1704067207179")
    assert(r.getAs[String]("_corrupt") == null)
  }

  test("malformed numeric field: that field nulls, the rest parse, row is flagged") {
    val r = parseOne("fitbit,2024-01-01 00:03:52,46,1,2,notanumber,12.31,46,click,1704067432824")
    assert(r.getAs[Any]("pulse") == null)
    assert(r.getAs[Double]("temp") == 12.31)
    assert(r.getAs[String]("user_id") == "46")
    assert(r.getAs[String]("_corrupt") != null)
  }

  test("truncated line: missing fields null, row is flagged, batch survives") {
    // The reference would crash the whole batch here
    // (NumberFormatException at IOTSparkStreaming.scala:53).
    val r = parseOne("fitbit,oops")
    assert(r.getAs[String]("rtype") == "fitbit")
    assert(r.getAs[Any]("user_id") == null)
    assert(r.getAs[String]("_corrupt") != null)
  }

  test("tag demux routes multiplexed lines before any per-topic parse") {
    import spark.implicits._
    val lines = Seq(
      "fitbit,2024-01-01 00:00:07,8,1,2,70.0,36.6,26,NORMAL,1704067207179",
      "sales,2024-01-01,42",
      "new-user-notification,30,M,athlete,80.5,1.8,24.8,15.2,HYP_1,130.0,85.0,u77,d9")
    val df = lines.toDF("value")
    assert(df.filter(Wire.tagOf(col("value")) === "fitbit").count() == 1)
    assert(df.filter(Wire.tagOf(col("value")) === "sales").count() == 1)
    assert(df.filter(Wire.tagOf(col("value")) === "new-user-notification").count() == 1)
  }

  test("new-user line parses 12 typed profile fields (P6)") {
    import spark.implicits._
    val r = Seq("new-user-notification,30,M,athlete,80.5,1.8,24.8,15.2,HYP_1,130.0,85.0,u77,d9")
      .toDF("value")
      .select(Wire.parseCsv(col("value"), Wire.NewUserSchema).as("r"))
      .select(col("r.*")).head()
    assert(r.getAs[Int]("age") == 30 && r.getAs[String]("gender") == "M")
    assert(r.getAs[Double]("weight") == 80.5 && r.getAs[Double]("bp_dia") == 85.0)
    assert(r.getAs[String]("user_id") == "u77" && r.getAs[String]("device_id") == "d9")
    assert(r.getAs[String]("_corrupt") == null)
  }

  test("seq-versioned sales line parses via SalesSchemaV2 (s13 wire)") {
    import spark.implicits._
    val rows = Seq(
      "sales,2024-03-05,42,1007",       // versioned record
      "sales,2024-03-05,not-a-number,3") // corrupt count must flag, not crash
      .toDF("value")
      .select(Wire.parseCsv(col("value"), Wire.SalesSchemaV2).as("r"))
      .select(col("r.*")).collect()
    val ok = rows(0)
    assert(ok.getAs[String]("date") == "2024-03-05")
    assert(ok.getAs[Int]("count") == 42)
    assert(ok.getAs[Long]("seq") == 1007L)
    assert(ok.getAs[String]("_corrupt") == null)
    val bad = rows(1)
    assert(bad.isNullAt(bad.fieldIndex("count")))
    assert(bad.getAs[String]("_corrupt") != null)
  }

  test("fitbitLine rendering round-trips through the parser") {
    import spark.implicits._
    val events = Seq((7L, java.sql.Timestamp.valueOf("2024-03-05 10:22:01.123"),
      42L, "error", 179.51, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val line = events.select(Wire.fitbitLine.as("value"))
    val r = line.select(Wire.parseCsv(col("value"), Wire.FitbitSchema).as("r"))
      .select(col("r.*")).head()
    assert(r.getAs[String]("ts_str") == "2024-03-05 10:22:01")
    assert(r.getAs[String]("user_id") == "42")
    assert(r.getAs[Double]("pulse") == 179.51)
    assert(r.getAs[Int]("age") == (42 % 60 + 18))
    assert(r.getAs[String]("_corrupt") == null)
  }
}
