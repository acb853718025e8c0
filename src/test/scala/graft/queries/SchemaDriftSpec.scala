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

  test("every table loads with its contract schema on every testdata dir") {
    // The generic form of the events.ts lesson: if the driver regenerates
    // ANY table with a different physical encoding, this names the table
    // and column in seconds instead of erroring dozens of queries at gate
    // time. The expected types are the LOGICAL contract after Tables.load
    // normalization (timestamps session-local, embeddings float arrays).
    val contract = Map(
      "region" -> "r_regionkey:int,r_name:string",
      "nation" -> "n_nationkey:int,n_name:string,n_regionkey:int",
      "customer" -> "c_custkey:bigint,c_name:string,c_nationkey:int,c_acctbal:double,c_mktsegment:string",
      "supplier" -> "s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double",
      "part" -> "p_partkey:bigint,p_name:string,p_brand:string,p_type:string,p_size:int,p_retailprice:double",
      "orders" -> "o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string,o_totalprice:double,o_orderdate:timestamp,o_orderpriority:string",
      "lineitem" -> ("l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint,l_linenumber:int," +
        "l_quantity:double,l_extendedprice:double,l_discount:double,l_tax:double," +
        "l_returnflag:string,l_linestatus:string,l_shipdate:timestamp"),
      "events" -> "event_id:bigint,ts:timestamp,user_id:bigint,event_type:string,value:double,props:string",
      "documents" -> "doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint",
      "embeddings" -> "vec_id:bigint,embedding:array<float>,label:int")
    val sfDirs = new java.io.File("/root/testdata").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("sf")).map(_.toString)
    for (dir <- sfDirs; name <- Tables.names) {
      val got = Tables.load(spark, dir, name).schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
      // Timestamp columns may legitimately arrive NTZ (naive micros) —
      // under the pinned UTC session both read identically, so the
      // contract accepts either for non-events tables; events.ts is
      // normalized by Tables.load and must be exactly TIMESTAMP.
      val norm = got.replace(":timestamp_ntz", ":timestamp")
      assert(norm === contract(name), s"dir=$dir table=$name got=$got")
    }
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
