package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join by key salting.
  *
  * A shuffle join hashes rows to reducers by key, so one hot key melts one
  * reducer while the rest idle — the classic 100 TB failure mode. Salting
  * scatters the big (skewed) side across `salt` sub-keys and replicates the
  * small side to every sub-key; the hot key's rows then spread over `salt`
  * reducers. Join semantics are unchanged: every big-side row still meets
  * every matching small-side row exactly once.
  *
  * AQE's runtime skew-join handles this automatically for sort-merge joins
  * with observable skew; explicit salting remains the tool when the skew is
  * known up front, the join is not AQE-eligible, or the hot key exceeds
  * what split-and-replicate can absorb at plan time.
  */
object SaltedJoin {

  /** Inner equi-join of a skewed `big` side with a `small` side on `key`,
    * spread over `salt` sub-keys. The salt assignment only needs to spread
    * rows (not be stable), so it hashes the whole big-side row. */
  def apply(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salt)))
    val replicatedSmall = small.withColumn("_salt",
      explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    saltedBig.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
