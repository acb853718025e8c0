package graft.queries

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, TimestampNTZType, TimestampType}

import java.nio.file.Files
import java.sql.Timestamp
import java.time.{Instant, LocalDateTime, ZoneOffset}

/** Pins the catalog contract that broke round 9: `events.ts` must load as
  * session-local TIMESTAMP with identical values whatever physical encoding
  * the upstream parquet writer used. The driver regenerated testdata from
  * int64-nanos to timestamp[us] between rounds and the hardcoded conversion
  * erred 46/120 queries — this spec fails in seconds on the next such drift.
  */
class SchemaDriftSpec extends SparkSpec {
  import spark.implicits._

  // One logical instant per row, expressed three physical ways. The session
  // is pinned UTC by Tables.prepare, so the naive (NTZ) encoding of each
  // instant is its UTC wall-clock reading.
  private val instants: Seq[Instant] = Seq(
    LocalDateTime.of(2024, 3, 1, 12, 30, 15, 123456000),
    LocalDateTime.of(2024, 3, 2, 0, 0, 0, 0),
    LocalDateTime.of(2023, 12, 31, 23, 59, 59, 999999000)
  ).map(_.toInstant(ZoneOffset.UTC))

  private def writeRead(encode: String): org.apache.spark.sql.DataFrame = {
    val dir = Files.createTempDirectory(s"graft-drift-$encode-").toString
    val df = encode match {
      case "int64-nanos" =>
        // The nanosAsLong read path surfaces parquet nano timestamps as
        // BIGINT; a plain long column exercises the identical LongType
        // branch of normalizeTs.
        instants.map(i => i.getEpochSecond * 1000000000L + i.getNano)
          .toDF("ts")
      case "ntz-micros" =>
        // LocalDateTime encodes natively as TIMESTAMP_NTZ → parquet
        // timestamp[us] isAdjustedToUTC=false, the current testdata vintage.
        instants.map(LocalDateTime.ofInstant(_, ZoneOffset.UTC)).toDF("ts")
      case "ltz-micros" =>
        instants.map(Timestamp.from).toDF("ts")
    }
    df.write.mode("overwrite").parquet(dir)
    Tables.normalizeTs(spark.read.parquet(dir))
  }

  test("ntz fixture really is TIMESTAMP_NTZ on raw read") {
    Tables.prepare(spark)
    val dir = Files.createTempDirectory("graft-drift-raw-").toString
    instants.map(LocalDateTime.ofInstant(_, ZoneOffset.UTC)).toDF("ts")
      .write.mode("overwrite").parquet(dir)
    assert(spark.read.parquet(dir).schema("ts").dataType === TimestampNTZType)
  }

  test("all three physical encodings yield identical typed rows") {
    Tables.prepare(spark)
    val expected = instants.map(Timestamp.from).toSet
    for (enc <- Seq("int64-nanos", "ntz-micros", "ltz-micros")) {
      val out = writeRead(enc)
      assert(out.schema("ts").dataType === TimestampType, s"encoding=$enc")
      val got = out.select($"ts").as[Timestamp].collect().toSet
      assert(got === expected, s"encoding=$enc")
    }
  }

  test("normalizeTs rejects an unconvertible physical type loudly") {
    val df = Seq("2024-01-01").toDF("ts").select(col("ts").cast(StringType).as("ts"))
    val e = intercept[IllegalStateException](Tables.normalizeTs(df))
    assert(e.getMessage.contains("unsupported physical type"))
  }

  test("events.ts loads as TIMESTAMP on every driver testdata dir") {
    val sfDirs = new java.io.File("/root/testdata").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("sf")).map(_.toString)
    assert(sfDirs.nonEmpty, "no /root/testdata/sf* dirs found")
    for (dir <- sfDirs) {
      val ev = Tables.load(spark, dir, "events")
      assert(ev.schema("ts").dataType === TimestampType, s"dir=$dir")
      assert(ev.limit(1).count() === 1, s"dir=$dir readable")
    }
  }
}
