package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salting must change the shuffle distribution, never the join result. */
class SaltedJoinSpec extends SparkSpec {

  test("salted join result equals the plain join on heavily skewed data") {
    import spark.implicits._
    // 90% of the big side lands on key 0 — the hot-reducer shape.
    val big = (1 to 5000).map(i => (if (i % 10 != 0) 0L else i.toLong % 17, s"v$i"))
      .toDF("k", "payload")
    val small = (0L to 16L).map(k => (k, s"dim$k")).toDF("k", "attr")
    val plain = big.join(small, "k")
      .orderBy("k", "payload", "attr").collect().toSeq
    val salted = SaltedJoin(big, small, "k", salt = 8)
      .orderBy("k", "payload", "attr").collect().toSeq
    assert(salted == plain)
    assert(plain.size == 5000)
  }

  test("salted join shuffles on the composite (key, salt) pair") {
    import spark.implicits._
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val big = (1 to 100).map(i => (0L, i)).toDF("k", "v")
      val small = Seq((0L, "x")).toDF("k", "attr")
      val plan = SaltedJoin(big, small, "k", salt = 4)
        .queryExecution.executedPlan.toString
      assert(plan.contains("_salt"), plan)
      assert(plan.contains("hashpartitioning(k"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
