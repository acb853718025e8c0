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

object GraftQuery {

  /** Mark every non-recursive CTE `AS MATERIALIZED` (DuckDB planner hint;
    * value-neutral). Under `WITH RECURSIVE`, DuckDB stops auto-materializing
    * multiply-referenced CTEs, so a CTE read by the recursive member — or a
    * nested sub-oracle wrapped in a CTE — is re-executed on EVERY recursion
    * iteration. Measured: the trained-codebook chain re-expands >10 min vs
    * 1.6 s at sf0.01 (e08), and m07's un-materialized `mlab`/`tlab` nested
    * oracles cost 787 s vs seconds (the round-12 gate zero). Recursive CTEs
    * themselves cannot be materialized and must be listed in `exclude`
    * (every oracle in this repo names its recursive members `reach` or
    * `ureach`). */
  def materializeCtes(
      sql: String,
      exclude: Set[String] = Set("reach", "ureach")): String = {
    val excl = exclude.mkString("|")
    sql.replaceAll(s"\\b(?!(?:$excl)\\b)(\\w+) AS \\(", "$1 AS MATERIALIZED (")
  }
}
