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
  val K: Int = 32
  /** LSH banding: Bands × Rows == K; collision threshold ≈
    * (1/Bands)^(1/Rows) = (1/8)^(1/4) ≈ 0.59 — right at the ≥0.5-Jaccard
    * near-duplicate target, and 4-row bands keep the false-positive candidate
    * count from exploding quadratically as the corpus grows (2-row bands
    * admit ~sqrt-threshold collisions; see VERDICT r1 item 3). */
  val Bands: Int = 8
  val Rows: Int = 4

  /** Multipliers (primes < 2^30). */
  val A: Seq[Long] = Seq(
    982451707L, 972451687L, 962451667L, 952451737L,
    942451667L, 932451661L, 922451681L, 912451663L,
    902451659L, 892451671L, 882451663L, 872451667L,
    862451659L, 852451657L, 842451671L, 832451657L,
    822451673L, 812451659L, 802451687L, 792451657L,
    782451679L, 772451657L, 762451663L, 752451673L,
    742451701L, 732451669L, 722451659L, 712451659L,
    702451663L, 692451659L, 682451677L, 672451669L)

  /** Offsets (primes). */
  val B: Seq[Long] = Seq(
    15485867L, 24485891L, 33485867L, 42485867L,
    51485869L, 60485869L, 69485873L, 78485909L,
    87485869L, 96485891L, 105485869L, 114485873L,
    123485903L, 132485869L, 141485879L, 150485893L,
    159485923L, 168485869L, 177485873L, 186485879L,
    195485879L, 204485867L, 213485911L, 222485869L,
    231485867L, 240485867L, 249485881L, 258485873L,
    267485873L, 276485879L, 285485873L, 294485881L)

  /** Space-tokenize a text column, dropping empty tokens. Doubled / leading /
    * trailing spaces produce empty strings from `split`, and the engines
    * disagree on hashing them (Spark `ascii('')` = 0, DuckDB `ord('')` = -1)
    * — filtering keeps every downstream hash engine-portable. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  /** DuckDB fragment for [[tokens]]. */
  def tokensSql(expr: String): String =
    s"list_filter(string_split($expr, ' '), t -> t <> '')"

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
