package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named query exposed through `SparkEntry`: a Spark implementation plus
  * (when SQL-expressible) a DuckDB oracle computing the same result on the
  * same parquet tables. Every query ends in a total ORDER BY so row order is
  * deterministic on both engines, and every floating aggregate goes through
  * [[graft.functions.Deterministic]] so values are bit-reproducible.
  */
final case class GraftQuery(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
