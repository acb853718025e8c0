package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import PortableHash._

/** Near-duplicate detection building blocks for the training-data pipeline:
  * token hashes → hashed word shingles → portable MinHash signatures → LSH
  * band keys, plus a 30-bit SimHash. All pure Catalyst expressions
  * (higher-order functions on arrays) — per-row map-side work that scales
  * linearly; the only shuffle in the dedup pipeline is the LSH band-key
  * join, which is exactly the shuffle MinHash-LSH exists to make small.
  *
  * Cost model (the r1→r2 fix): each token is char-folded ONCE per document
  * (`tokenHashes`, O(chars) total), and each k-shingle hash is then a k-step
  * integer fold over token hashes (`hashedShingles`, O(tokens·k) cheap int
  * ops) — replacing the r1 design that char-folded every shingle string
  * (O(chars·k) interpreted higher-order steps, re-evaluated per reference).
  */
object DedupFunctions {

  /** Portable hash of every (non-empty) token, one char-fold per token. */
  def tokenHashes(text: Column): Column =
    transform(tokens(text), t => stringHash(t))

  /** DuckDB fragment for [[tokenHashes]]. */
  def tokenHashesSql(textExpr: String): String =
    s"list_transform(${tokensSql(textExpr)}, t -> ${stringHashSql("t")})"

  /** Distinct hashed word k-shingles from a token-hash array: the shingle
    * hash is the k-step [[PortableHash.foldHash]] of its token hashes. */
  def hashedShingles(th: Column, k: Int): Column =
    when(size(th) >= k,
      array_distinct(transform(sequence(lit(0), size(th) - k),
        i => foldHash(slice(th, i + lit(1), lit(k))))))
      .otherwise(array().cast("array<bigint>"))

  /** DuckDB fragment for [[hashedShingles]] over a BIGINT[] expression. */
  def hashedShinglesSql(thExpr: String, k: Int): String =
    s"CASE WHEN len($thExpr) >= $k THEN list_distinct(" +
      s"list_transform(generate_series(1, len($thExpr) - ${k - 1}), " +
      s"i -> ${foldHashSql(s"($thExpr)[i:i+${k - 1}]")})) " +
      s"ELSE CAST([] AS BIGINT[]) END"

  /** DuckDB fragment for the POSITIONAL (non-distinct) k-shingle hashes the
    * native `graft_shingle_hashes_all` expression computes — same k-step
    * fold as [[hashedShingles]], duplicates kept in window order. */
  def positionalShinglesSql(thExpr: String, k: Int): String =
    s"CASE WHEN len($thExpr) >= $k THEN " +
      s"list_transform(generate_series(1, len($thExpr) - ${k - 1}), " +
      s"i -> ${foldHashSql(s"($thExpr)[i:i+${k - 1}]")}) " +
      s"ELSE CAST([] AS BIGINT[]) END"

  /** Distinct word k-shingles as strings (for exact-Jaccard verification).
    * Takes an already-materialized token ARRAY column, never raw text — an
    * inlined tokenizer subtree would be re-evaluated once per lambda
    * invocation (interpreted HOFs have no CSE; see TextQueries staging). */
  def wordShingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      array_distinct(transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(k))))))
      .otherwise(array().cast("array<string>"))

  /** DuckDB fragment for [[wordShingles]] over a filtered token list. */
  def wordShinglesSql(toksExpr: String, k: Int): String =
    s"CASE WHEN len($toksExpr) >= $k THEN list_distinct(" +
      s"list_transform(generate_series(1, len($toksExpr) - ${k - 1}), " +
      s"i -> array_to_string(($toksExpr)[i:i+${k - 1}], ' '))) " +
      s"ELSE CAST([] AS VARCHAR[]) END"

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
