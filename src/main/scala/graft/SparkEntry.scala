package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{GraftQuery, MultimodalQueries, RelationalQueries, SimilarityQueries, StreamingQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query is registered as a [[graft.queries.GraftQuery]]: a Spark
  * implementation plus (where SQL-expressible) a DuckDB oracle over the same
  * parquet tables. Queries without an oracle get the driver's weaker
  * rows-only check.
  */
object SparkEntry {

  /** Full registry; grows as operators land (SURVEY.md §2 checklist). */
  def registry: Seq[GraftQuery] = {
    val qs = RelationalQueries.all ++ TextQueries.all ++ SimilarityQueries.all ++
      StreamingQueries.all ++ MultimodalQueries.all
    // A query val referenced in an `all` Seq before its definition is null
    // at object init — fail loudly here instead of NPEing mid-dispatch.
    require(!qs.contains(null), "registry contains null (forward reference in an `all` Seq)")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q01PricingSummary.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
