package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables
import graft.functions.PortableHash

/** Similarity search over the `embeddings` table (`Array[Float]`, dim 64).
  *
  * Determinism: every float is widened to double before arithmetic, and dot
  * products / norms are computed as LEFT FOLDS (`aggregate` in Spark,
  * `list_reduce` in DuckDB) so the floating-point operation order — and
  * therefore every bit of the result — is identical in both engines.
  *
  * Scale: brute-force top-k broadcasts the (small) query set and scans the
  * corpus once — the right baseline plan; the LSH-bucketed variant (round 2)
  * cuts the scan to matching buckets for large query sets.
  */
object SimilarityQueries {

  private val foldAdd: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
    org.apache.spark.sql.Column = (a, x) => a + x

  /** Brute-force cosine top-5 for query vectors vec_id < 8. */
  val e01CosineKnn: GraftQuery = GraftQuery(
    "e01_cosine_knn",
    "brute-force cosine top-5 (deterministic left-fold dot products)",
    (s, dir) => {
      val v = Tables.load(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("ve"))
      val n = v.withColumn("nrm",
        sqrt(call_function("graft_dot", col("ve"), col("ve"))))
      val q = broadcast(n.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("ve").as("qv"), col("nrm").as("qnrm")))
      val scored = n.crossJoin(q)
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("dot", call_function("graft_dot", col("qv"), col("ve")))
        .withColumn("cosine", col("dot") / (col("qnrm") * col("nrm")))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cosine").desc, col("vec_id"))
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("qid"), col("vec_id"), col("rnk"), col("cosine"))
        .orderBy(col("qid"), col("rnk"))
    },
    Some("""WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        FROM embeddings),
      n AS (
        SELECT vec_id, ve,
          sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(ve, x -> x * x)), (a, b) -> a + b)) AS nrm
        FROM v),
      q AS (SELECT vec_id AS qid, ve AS qv, nrm AS qnrm FROM n WHERE vec_id < 8),
      scored AS (
        SELECT q.qid, n.vec_id,
          list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(list_zip(q.qv, n.ve), p -> p[1] * p[2])), (a, b) -> a + b)
            / (q.qnrm * n.nrm) AS cosine
        FROM q, n WHERE n.vec_id <> q.qid)
      SELECT qid, vec_id, CAST(rnk AS INT) AS rnk, cosine FROM (
        SELECT qid, vec_id, cosine,
          row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rnk
        FROM scored)
      WHERE rnk <= 5 ORDER BY qid, rnk"""))

  /** Number of random hyperplanes for e02's signed-projection LSH: 2^8 =
    * 256 buckets. */
  val Planes: Int = 8

  /** Integer hyperplane coefficient for (plane p, 1-based dim i), drawn from
    * the portable hash family: ((A(p)·i + B(p)) mod P) mod 2001 − 1000 ∈
    * [−1000, 1000]. Integer-exact in both engines. */
  private def coef(p: Int, i1: org.apache.spark.sql.Column) =
    (((lit(PortableHash.A(p)) * i1 + lit(PortableHash.B(p))) % lit(PortableHash.P))
      % lit(2001L) - lit(1000L)).cast("double")

  private def coefSql(p: Int): String =
    s"CAST((((${PortableHash.A(p)} * i + ${PortableHash.B(p)}) % ${PortableHash.P}) % 2001) - 1000 AS DOUBLE)"

  /** e02 — bucketed approximate nearest neighbors: random-hyperplane sign
    * LSH → bucket equi-join → exact cosine re-rank inside the bucket. The
    * scale path e01's brute-force scan lacks: the join shuffles on a
    * 256-way bucket key instead of crossing corpus × queries, so candidate
    * work scales with bucket occupancy (corpus/2^Planes), not corpus size.
    * The oracle mirrors the LSH pipeline itself, so results stay
    * value-exact (recall loss vs exact KNN is a property of the algorithm,
    * reproduced identically in DuckDB). No crossJoin anywhere in the plan. */
  val e02AnnLsh: GraftQuery = GraftQuery(
    "e02_ann_lsh",
    "random-hyperplane LSH bucketed ANN with exact cosine re-rank (no crossJoin)",
    (s, dir) => {
      val prepared = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("ve"))
        .withColumn("nrm", sqrt(call_function("graft_dot", col("ve"), col("ve"))))
        .withColumn("bucket",
          (0 until Planes).map { p =>
            val dot = aggregate(
              transform(col("ve"), (x, i) => x * coef(p, i + lit(1))),
              lit(0.0), foldAdd)
            when(dot >= 0.0, lit(1L << p)).otherwise(lit(0L))
          }.reduce(_ + _))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val q = prepared.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("ve").as("qv"),
          col("nrm").as("qnrm"), col("bucket"))
      val scored = prepared.join(q, Seq("bucket"))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("dot", call_function("graft_dot", col("qv"), col("ve")))
        .withColumn("cosine", col("dot") / (col("qnrm") * col("nrm")))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cosine").desc, col("vec_id"))
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("qid"), col("vec_id"), col("rnk"), col("cosine"))
        .orderBy(col("qid"), col("rnk"))
    },
    Some {
      val bucketSql = (0 until Planes).map { p =>
        s"CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
          s"list_transform(generate_series(1, len(ve)), i -> ve[i] * ${coefSql(p)})), " +
          s"(a, b) -> a + b) >= 0 THEN ${1L << p} ELSE 0 END"
      }.mkString("(", " + ", ")")
      s"""WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        FROM embeddings),
      n AS (
        SELECT vec_id, ve,
          sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(ve, x -> x * x)), (a, b) -> a + b)) AS nrm,
          $bucketSql AS bucket
        FROM v),
      q AS (SELECT vec_id AS qid, ve AS qv, nrm AS qnrm, bucket FROM n WHERE vec_id < 8),
      scored AS (
        SELECT q.qid, n.vec_id,
          list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(list_zip(q.qv, n.ve), p -> p[1] * p[2])), (a, b) -> a + b)
            / (q.qnrm * n.nrm) AS cosine
        FROM q JOIN n USING (bucket) WHERE n.vec_id <> q.qid)
      SELECT qid, vec_id, CAST(rnk AS INT) AS rnk, cosine FROM (
        SELECT qid, vec_id, cosine,
          row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rnk
        FROM scored)
      WHERE rnk <= 5 ORDER BY qid, rnk"""
    })

  /** d10 — embedding-cosine near-duplicate pairs (the dedup-mode sibling of
    * e02): coarser LSH (4 planes → 16 buckets, higher recall at a denser
    * candidate set), bucket equi-join on vec_id < vec_id, exact cosine
    * verification at ≥ 0.35. Same no-crossJoin shape as e02: candidate work
    * is Σ bucket² rather than corpus². */
  val d10EmbeddingNeardup: GraftQuery = GraftQuery(
    "d10_embedding_neardup",
    "embedding-cosine near-dup pairs: 4-plane LSH buckets + exact cosine >= 0.35",
    (s, dir) => {
      val planes = 4
      val prepared = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("ve"))
        .withColumn("nrm", sqrt(call_function("graft_dot", col("ve"), col("ve"))))
        .withColumn("bucket",
          (0 until planes).map { p =>
            val dot = aggregate(
              transform(col("ve"), (x, i) => x * coef(p, i + lit(1))),
              lit(0.0), foldAdd)
            when(dot >= 0.0, lit(1L << p)).otherwise(lit(0L))
          }.reduce(_ + _))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val b = prepared.select(col("bucket"), col("vec_id").as("vid_b"),
        col("ve").as("ve_b"), col("nrm").as("nrm_b"))
      prepared.join(b, Seq("bucket"))
        .filter(col("vec_id") < col("vid_b"))
        .withColumn("cosine",
          call_function("graft_dot", col("ve"), col("ve_b"))
            / (col("nrm") * col("nrm_b")))
        .filter(col("cosine") >= 0.35)
        .select(col("vec_id").as("vec_a"), col("vid_b").as("vec_b"), col("cosine"))
        .orderBy(col("vec_a"), col("vec_b"))
    },
    Some {
      val planes = 4
      val bucketSql = (0 until planes).map { p =>
        s"CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
          s"list_transform(generate_series(1, len(ve)), i -> ve[i] * ${coefSql(p)})), " +
          s"(a, b) -> a + b) >= 0 THEN ${1L << p} ELSE 0 END"
      }.mkString("(", " + ", ")")
      s"""WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        FROM embeddings),
      n AS (
        SELECT vec_id, ve,
          sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(ve, x -> x * x)), (a, b) -> a + b)) AS nrm,
          $bucketSql AS bucket
        FROM v)
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(list_zip(a.ve, b.ve), p -> p[1] * p[2])), (x, y) -> x + y)
          / (a.nrm * b.nrm) AS cosine
      FROM n a JOIN n b USING (bucket)
      WHERE a.vec_id < b.vec_id
        AND list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(list_zip(a.ve, b.ve), p -> p[1] * p[2])), (x, y) -> x + y)
          / (a.nrm * b.nrm) >= 0.35
      ORDER BY vec_a, vec_b"""
    })

  val all: Seq[GraftQuery] = Seq(e01CosineKnn, e02AnnLsh, d10EmbeddingNeardup)
}
