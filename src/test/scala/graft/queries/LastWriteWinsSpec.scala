package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The K2/K3 relational upsert semantics (q07/q08): the window-dedup plan
  * must be invariant to input order and partitioning — the property the
  * reference gets only implicitly from Cassandra PK overwrite. */
class LastWriteWinsSpec extends SparkSpec {

  test("row_number dedup result is invariant to input shuffling and partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (1 to 500).map(i => (i.toLong % 37, i.toLong, rnd.nextDouble()))
    def latest(input: Seq[(Long, Long, Double)], parts: Int) = {
      val w = Window.partitionBy(col("k")).orderBy(col("seq").desc)
      input.toDF("k", "seq", "v").repartition(parts)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .drop("rn").orderBy("k")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    }
    val base = latest(rows, 1)
    assert(latest(rnd.shuffle(rows), 7) == base)
    assert(latest(rows.reverse, 16) == base)
  }

  test("per-key latest equals the naive groupBy-max model") {
    import spark.implicits._
    val rows = (1 to 300).map(i => ((i % 11).toLong, i.toLong, s"v$i"))
    val w = Window.partitionBy(col("k")).orderBy(col("seq").desc)
    val got = rows.toDF("k", "seq", "v")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("k", "v").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val expect = rows.groupBy(_._1).map { case (k, g) => (k, g.maxBy(_._2)._3) }
      .toSeq.sortBy(_._1)
    assert(got == expect)
  }
}
