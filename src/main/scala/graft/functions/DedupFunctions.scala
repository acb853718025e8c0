package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import PortableHash._

/** Near-duplicate detection building blocks for the training-data pipeline:
  * word shingles → portable MinHash signatures → LSH band keys, plus a
  * 30-bit SimHash. All pure Catalyst expressions (higher-order functions on
  * arrays) — per-row map-side work that scales linearly; the only shuffle in
  * the dedup pipeline is the LSH band-key join, which is exactly the
  * shuffle MinHash-LSH exists to make small.
  */
object DedupFunctions {

  /** Distinct word k-shingles of a space-tokenized text column. */
  def wordShingles(text: Column, k: Int): Column = {
    val toks = split(text, " ")
    when(size(toks) >= k,
      array_distinct(transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(k))))))
      .otherwise(array().cast("array<string>"))
  }

  /** DuckDB fragment for [[wordShingles]] over `string_split(text, ' ')`. */
  def wordShinglesSql(toksExpr: String, k: Int): String =
    s"CASE WHEN len($toksExpr) >= $k THEN list_distinct(" +
      s"list_transform(generate_series(1, len($toksExpr) - ${k - 1}), " +
      s"i -> array_to_string(($toksExpr)[i:i+${k - 1}], ' '))) " +
      s"ELSE CAST([] AS VARCHAR[]) END"

  /** Portable-hash each shingle. */
  def shingleHashes(shingles: Column): Column =
    transform(shingles, sh => stringHash(sh))

  /** K-minima MinHash signature (array<bigint>, null entries iff no
    * shingles). */
  def minhashSignature(hashes: Column): Column =
    array((0 until K).map { i =>
      array_min(transform(hashes, x => (lit(A(i)) * x + lit(B(i))) % lit(P)))
    }: _*)

  /** DuckDB fragment for [[minhashSignature]] over a BIGINT[] expression. */
  def minhashSignatureSql(hashesExpr: String): String =
    s"list_transform(generate_series(1, $K), i -> list_min(" +
      s"list_transform($hashesExpr, x -> (($aSql)[i] * x + ($bSql)[i]) % $P)))"

  /** LSH band keys: fold each (Bands × Rows) signature slice to one hash. */
  def bandKeys(sig: Column): Column =
    array((0 until Bands).map { j =>
      foldHash(slice(sig, j * Rows + 1, Rows))
    }: _*)

  /** DuckDB fragment for [[bandKeys]] over a signature list expression. */
  def bandKeysSql(sigExpr: String): String =
    (0 until Bands).map { j =>
      foldHashSql(s"($sigExpr)[${j * Rows + 1}:${j * Rows + Rows}]")
    }.mkString("[", ", ", "]")

  /** Positionwise signature agreement count (bigint). */
  def signatureMatches(sa: Column, sb: Column): Column =
    aggregate(zip_with(sa, sb, (x, y) => when(x === y, lit(1L)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc + v)

  /** 30-bit SimHash over the multiset of token hashes: bit k is set iff at
    * least half the tokens have bit k set in their portable hash. */
  def simhash(tokenHashes: Column): Column = {
    val n = size(tokenHashes)
    (0 until 30).map { k =>
      when(lit(2) * size(filter(tokenHashes,
        h => shiftright(h, k).bitwiseAND(lit(1L)) === 1L)) >= n, lit(1L << k))
        .otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** DuckDB fragment for [[simhash]] over a BIGINT[] expression. */
  def simhashSql(hashesExpr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(generate_series(0, 29), k -> " +
      s"CASE WHEN 2 * len(list_filter($hashesExpr, h -> ((h >> k) & 1) = 1)) >= len($hashesExpr) " +
      s"THEN (CAST(1 AS BIGINT) << k) ELSE CAST(0 AS BIGINT) END)), (a, b) -> a + b)"
}
