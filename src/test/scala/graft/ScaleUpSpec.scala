package graft

import org.apache.spark.sql.functions._

/** Pins the derived-scale generator's decorrelation contract ABOVE the
  * wrap-around points where the v1 transforms degenerated: a bare Caesar
  * shift hands replicas 26 apart verbatim twin TEXTS, and a bare
  * slice-rotation hands replicas dim (= 64) apart verbatim twin VECTORS —
  * at factor 100 that is 4 exact text copies and 37 exact vector copies of
  * replica 0, turning every x100 dedup/ANN measurement into a fixture
  * artifact (quadratic clique growth) instead of engine scaling. Built at
  * factor 70 over sf0.001 so both wrap points (26, 64) are inside the run.
  */
class ScaleUpSpec extends SparkSpec {

  private val srcDir = "/root/testdata/sf0.001"
  private lazy val outDir = {
    val d = java.nio.file.Files.createTempDirectory("graft-scaleup-").toString
    ScaleUp.ensure(spark, srcDir, d, 70)
    d
  }

  test("document replicas stay pairwise distinct past the Caesar wrap (i = 26)") {
    val base = spark.read.parquet(s"$srcDir/documents.parquet")
      .orderBy("doc_id").limit(1).collect().head
    val baseId = base.getLong(0)
    val baseText = base.getString(1)
    val stride = spark.read.parquet(s"$srcDir/documents.parquet")
      .agg(max(col("doc_id"))).head().getLong(0) + 1L
    val reps = spark.read.parquet(s"$outDir/documents.parquet")
      .filter(col("doc_id") % stride === baseId)
      .select((col("doc_id") / stride).cast("int").as("i"), col("text"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(reps.size == 70)
    // Same doc, every replica: same length (bijective char map), replica 0
    // verbatim, and ALL 70 texts pairwise distinct — in particular i = 26,
    // the v1 Caesar collision.
    assert(reps(0) == baseText)
    assert(reps.values.forall(_.length == baseText.length))
    assert(reps.values.toSeq.distinct.size == 70,
      s"replica texts collide (v1 bug class): i=26 == i=0 is ${reps(26) == reps(0)}")
  }

  test("embedding replicas stay pairwise distinct past the rotation wrap (i = 64)") {
    val src = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val stride = src.agg(max(col("vec_id"))).head().getLong(0) + 1L
    val baseId = src.orderBy("vec_id").limit(1).head().getLong(0)
    val reps = spark.read.parquet(s"$outDir/embeddings.parquet")
      .filter(col("vec_id") % stride === baseId)
      .select((col("vec_id") / stride).cast("int").as("i"), col("embedding"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1).toVector).toMap
    assert(reps.size == 70)
    assert(reps.values.toSeq.distinct.size == 70,
      s"replica vectors collide (v1 bug class): i=64 == i=0 is ${reps(64) == reps(0)}")
    // Orthogonality: rotation + sign flip preserve the norm exactly (the
    // multiset of |components| is unchanged, so the float sum of squares is
    // reorder-only; assert to 1e-6 relative, generous for a 64-term reorder).
    val norm0 = math.sqrt(reps(0).map(x => x.toDouble * x).sum)
    for ((i, v) <- reps) {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - norm0) <= 1e-6 * norm0, s"replica $i norm $n != $norm0")
      assert(v.map(x => math.abs(x)).sorted == reps(0).map(x => math.abs(x)).sorted,
        s"replica $i is not a signed permutation of replica 0")
    }
  }
}
