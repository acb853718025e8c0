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

  /** The previous [[sortedOnce]] cache — one live entry across the whole
    * registry, rotated (unpersisted) at the START of the next sortedOnce
    * call so (a) storage never accumulates across queries or bench reps and
    * (b) every run re-registers fresh and recomputes from the parquet
    * inputs (no cross-rep reuse). */
  private val lastSorted =
    new java.util.concurrent.atomic.AtomicReference[DataFrame]()

  /** Trailing presentation sort over a SHUFFLE-FREE expensive child
    * (optimization r17, guide §2.4/§5): a global `orderBy` range-partitions
    * its child, and the range partitioner's sampling pass EVALUATES the
    * child in full before the real pass does — for a map-only pipeline
    * (regex scrub, JSON parse, array quantization) that is the whole
    * expensive computation executed twice (children that end in a shuffle
    * or aggregate don't pay this: the sample pass re-reads their shuffle
    * files). Persisting the child shares one evaluation between the sample
    * and output passes; the cache entry is rotated out on the next
    * sortedOnce call. Results are unchanged — same rows, same total order.
    *
    * CONTRACT (ADVICE r17): the single rotation slot assumes queries are
    * BUILT AND EXECUTED SEQUENTIALLY — build A, run A, build B, run B — as
    * Bench/Verify/the driver do. Building a second sortedOnce frame before
    * executing the first unpersists the first frame's cache mid-flight:
    * still CORRECT for the deterministic children used here (the sample and
    * output passes recompute the same rows), but it silently restores the
    * double evaluation this helper exists to remove, and a NONDETERMINISTIC
    * child could then diverge between the two passes. A concurrent server
    * should scope the cache per returned frame (e.g. release via a
    * QueryExecutionListener) instead of this shared slot. */
  def sortedOnce(df: DataFrame,
                 cols: org.apache.spark.sql.Column*): DataFrame = {
    Option(lastSorted.getAndSet(null)).foreach(_.unpersist(false))
    val cached =
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    lastSorted.set(cached)
    cached.orderBy(cols: _*)
  }

  /** Mark every non-recursive CTE `AS MATERIALIZED` (DuckDB planner hint;
    * value-neutral). Under `WITH RECURSIVE`, DuckDB stops auto-materializing
    * multiply-referenced CTEs, so a CTE read by the recursive member — or a
    * nested sub-oracle wrapped in a CTE — is re-executed on EVERY recursion
    * iteration. Measured: the trained-codebook chain re-expands >10 min vs
    * 1.6 s at sf0.01 (e08), and m07's un-materialized `mlab`/`tlab` nested
    * oracles cost 787 s vs seconds (the round-12 gate zero). Recursive CTEs
    * themselves cannot be materialized and must be listed in `exclude`
    * (every oracle in this repo names its recursive members `reach` or
    * `ureach`).
    *
    * The rewrite is anchored to actual CTE positions (ADVICE r13: the old
    * `\\w+ AS \\(` regex would also corrupt a named `WINDOW w AS (...)`
    * clause into invalid SQL): a scanner walks every `WITH [RECURSIVE]`
    * keyword — including ones nested inside CTE bodies or subqueries — and
    * parses its comma-separated CTE list with balanced-paren matching,
    * skipping single-quoted string literals, so only a name in CTE-defining
    * position gets `MATERIALIZED` inserted. Already-annotated CTEs
    * (`AS [NOT] MATERIALIZED`) pass through untouched. */
  def materializeCtes(
      sql: String,
      exclude: Set[String] = Set("reach", "ureach")): String = {
    val n = sql.length
    // Precompute single-quoted string regions ('' is the escape) so a WITH
    // inside a literal is never treated as a CTE opener and paren matching
    // never counts parens inside literals.
    val inStr = new Array[Boolean](n)
    var si = 0
    var quoted = false
    while (si < n) {
      if (sql.charAt(si) == '\'') { quoted = !quoted; inStr(si) = true }
      else inStr(si) = quoted
      si += 1
    }
    def skipWs(from: Int): Int = {
      var i = from
      while (i < n && sql.charAt(i).isWhitespace) i += 1
      i
    }
    def ident(from: Int): Int = {
      var i = from
      while (i < n && (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_')) i += 1
      i
    }
    // From the index of '(' return the index just past its match.
    def skipBalanced(from: Int): Int = {
      var i = from
      var depth = 0
      while (i < n) {
        if (!inStr(i)) {
          if (sql.charAt(i) == '(') depth += 1
          else if (sql.charAt(i) == ')') { depth -= 1; if (depth == 0) return i + 1 }
        }
        i += 1
      }
      i
    }
    def kw(at: Int, word: String): Boolean =
      sql.regionMatches(true, at, word, 0, word.length) && {
        val e = at + word.length
        e >= n || !(sql.charAt(e).isLetterOrDigit || sql.charAt(e) == '_')
      }
    val inserts = scala.collection.mutable.ArrayBuffer.empty[Int]
    val withRe = java.util.regex.Pattern
      .compile("\\bWITH\\b", java.util.regex.Pattern.CASE_INSENSITIVE)
    val m = withRe.matcher(sql)
    while (m.find()) {
      if (!inStr(m.start())) {
        var i = skipWs(m.end())
        if (kw(i, "RECURSIVE")) i = skipWs(i + "RECURSIVE".length)
        var more = true
        while (more) {
          more = false
          val ns = i
          val ne = ident(ns)
          val name = sql.substring(ns, ne)
          if (name.nonEmpty) {
            i = skipWs(ne)
            // Optional explicit column list: name(col, ...) AS (...)
            if (i < n && sql.charAt(i) == '(') i = skipWs(skipBalanced(i))
            if (kw(i, "AS")) {
              i = skipWs(i + 2)
              if (kw(i, "NOT")) i = skipWs(i + 3)
              val already = kw(i, "MATERIALIZED")
              if (already) i = skipWs(i + "MATERIALIZED".length)
              if (i < n && sql.charAt(i) == '(') {
                if (!already && !exclude.contains(name)) inserts += i
                i = skipWs(skipBalanced(i))
                if (i < n && sql.charAt(i) == ',') { i = skipWs(i + 1); more = true }
              }
            }
          }
        }
      }
    }
    val sb = new StringBuilder(sql)
    inserts.sorted.reverseIterator.foreach(p => sb.insert(p, "MATERIALIZED "))
    sb.toString
  }
}
