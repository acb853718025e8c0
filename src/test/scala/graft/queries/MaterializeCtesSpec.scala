package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[GraftQuery.materializeCtes]] to CTE-defining positions only
  * (ADVICE r13): the rewrite must hit every `WITH`-list member — including
  * nested sub-oracle `WITH`s — and nothing else, in particular not a named
  * `WINDOW w AS (...)` clause, not `AS (` inside string literals, and not
  * CTEs that already carry a materialization hint. */
class MaterializeCtesSpec extends AnyFunSuite {
  private def mat(sql: String, excl: Set[String] = Set("reach", "ureach")) =
    GraftQuery.materializeCtes(sql, excl)

  test("rewrites every CTE in a multi-member WITH list") {
    val sql = "WITH a AS (SELECT 1), b AS (SELECT 2) SELECT * FROM a, b"
    assert(mat(sql) ==
      "WITH a AS MATERIALIZED (SELECT 1), b AS MATERIALIZED (SELECT 2) SELECT * FROM a, b")
  }

  test("rewrites a nested WITH inside a CTE body") {
    val sql = "WITH outer1 AS (WITH inner1 AS (SELECT 1) SELECT * FROM inner1) SELECT * FROM outer1"
    assert(mat(sql) ==
      "WITH outer1 AS MATERIALIZED (WITH inner1 AS MATERIALIZED (SELECT 1) SELECT * FROM inner1) SELECT * FROM outer1")
  }

  test("leaves a named WINDOW clause untouched") {
    val sql = """WITH t AS (SELECT 1 AS x)
      SELECT sum(x) OVER w AS s FROM t WINDOW w AS (ORDER BY x)"""
    val got = mat(sql)
    assert(got.contains("t AS MATERIALIZED (SELECT 1 AS x)"))
    assert(got.contains("WINDOW w AS (ORDER BY x)"))
    assert(!got.contains("w AS MATERIALIZED"))
  }

  test("skips excluded recursive members and regex metacharacters in names are inert") {
    val sql = "WITH RECURSIVE reach AS (SELECT 1 UNION ALL SELECT 2), sz AS (SELECT 3) SELECT * FROM reach, sz"
    val got = mat(sql)
    assert(got.contains("reach AS (SELECT 1"))
    assert(got.contains("sz AS MATERIALIZED (SELECT 3)"))
    // An exclusion name that is a regex metachar sequence must not blow up
    // or over-match (the old interpolated-regex hazard).
    assert(mat("WITH ab AS (SELECT 1) SELECT * FROM ab", Set("a|b", "a.")) ==
      "WITH ab AS MATERIALIZED (SELECT 1) SELECT * FROM ab")
  }

  test("ignores WITH and AS ( inside string literals") {
    val sql = "WITH t AS (SELECT 'WITH x AS (SELECT 1)' AS s) SELECT * FROM t"
    assert(mat(sql) ==
      "WITH t AS MATERIALIZED (SELECT 'WITH x AS (SELECT 1)' AS s) SELECT * FROM t")
  }

  test("balanced-paren matching survives quoted parens and '' escapes") {
    val sql = "WITH t AS (SELECT ')(''(' AS s), u AS (SELECT 2) SELECT * FROM t, u"
    val got = mat(sql)
    assert(got.contains("t AS MATERIALIZED ("))
    assert(got.contains("u AS MATERIALIZED (SELECT 2)"))
  }

  test("already-materialized and NOT MATERIALIZED CTEs pass through, list parsing continues") {
    val sql = "WITH a AS MATERIALIZED (SELECT 1), b AS NOT MATERIALIZED (SELECT 2), c AS (SELECT 3) SELECT * FROM a, b, c"
    assert(mat(sql) ==
      "WITH a AS MATERIALIZED (SELECT 1), b AS NOT MATERIALIZED (SELECT 2), c AS MATERIALIZED (SELECT 3) SELECT * FROM a, b, c")
  }

  test("idempotent: applying twice equals applying once") {
    val sql = "WITH RECURSIVE reach AS (SELECT 1), m AS (SELECT 2) SELECT * FROM reach, m"
    assert(mat(mat(sql)) == mat(sql))
  }

  test("explicit column lists and case-insensitive keywords are handled") {
    val sql = "with t (a, b) as (select 1, 2) select * from t"
    assert(mat(sql) == "with t (a, b) as MATERIALIZED (select 1, 2) select * from t")
  }
}
