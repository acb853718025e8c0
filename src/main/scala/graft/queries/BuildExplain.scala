package graft.queries

import org.apache.spark.sql.SparkSession

/** Scratch plan inspector for the graph-index BUILD job (not part of the
  * driver contract — the query-side sibling is [[graft.Explain]]): prints
  * the formatted physical plan of the fused `assign_write` union exactly as
  * [[SimilarityQueries.timeBuildCuts]] executes it, so exchange/subtree
  * REUSE across the g3/hops/ptau branches is inspectable instead of
  * inferred from cut arithmetic (round 17: the nn_descent−cand_join delta
  * read ≈ 3× the cand_join time, the signature of the shared candidate
  * subtree executing once per consuming branch). */
object BuildExplain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "derived/x10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SimilarityQueries.explainBuild(spark, dir)
    spark.stop()
  }
}
