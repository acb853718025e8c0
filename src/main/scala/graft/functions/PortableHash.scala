package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable hashing.
  *
  * Spark's `hash`/`xxhash64` and DuckDB's `hash` are different algorithms, so
  * sketch operators built on them could never be oracle-checked. Instead we
  * use a polynomial rolling hash over code points mod a 30-bit prime,
  * expressible as a left fold in BOTH engines (Spark `aggregate`, DuckDB
  * `list_reduce`) with identical integer semantics — every intermediate fits
  * in an int64 (h < 2^30, h*31 + c < 2^35; minhash's a*h + b < 2^60).
  *
  * This makes MinHash signatures, LSH band keys, and SimHash fingerprints
  * bit-identical across engines, so even approximate-dedup operators get a
  * full value-level oracle instead of a weaker rows-only check.
  */
object PortableHash {
  /** 30-bit prime modulus. */
  val P: Long = 1000000007L

  /** Minhash family size: h_i(x) = (A(i)·x + B(i)) mod P. */
  val K: Int = 16
  /** LSH banding: Bands × Rows == K; threshold ≈ (1/Bands)^(1/Rows) ≈ 0.35,
    * tuned to catch the ≥0.5-Jaccard near-duplicate band of the corpus. */
  val Bands: Int = 8
  val Rows: Int = 2

  /** Multipliers (primes < 2^30). */
  val A: Seq[Long] = Seq(
    982451653L, 941083981L, 920419813L, 899809343L,
    879190747L, 858599509L, 838041641L, 817504243L,
    796966801L, 776531401L, 756065159L, 735632791L,
    715225739L, 694847533L, 674506081L, 654188383L)

  /** Offsets (primes). */
  val B: Seq[Long] = Seq(
    15485863L, 32452843L, 49979687L, 67867967L,
    86028121L, 104395301L, 122949823L, 141650939L,
    160481183L, 179424673L, 198491317L, 217645177L,
    236887691L, 256203161L, 275604541L, 295075147L)

  /** Rolling hash of a string column: fold (h*31 + codepoint) mod P. */
  def stringHash(s: Column): Column =
    aggregate(split(s, ""), lit(0L), (h, c) => (h * lit(31L) + ascii(c)) % lit(P))

  /** DuckDB fragment computing exactly [[stringHash]] of `expr`. */
  def stringHashSql(expr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($expr, ''), c -> CAST(ord(c) AS BIGINT))), " +
      s"(h, c) -> (h * 31 + c) % $P)"

  /** Fold an int64 array column into one hash: (h*31 + v) mod P. */
  def foldHash(arr: Column): Column =
    aggregate(arr, lit(0L), (h, v) => (h * lit(31L) + v) % lit(P))

  /** DuckDB fragment computing exactly [[foldHash]] of a list expression. */
  def foldHashSql(expr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), $expr), (h, v) -> (h * 31 + v) % $P)"

  /** SQL literal for the A / B seed lists. */
  def aSql: String = A.mkString("[", ", ", "]")
  def bSql: String = B.mkString("[", ", ", "]")
}
