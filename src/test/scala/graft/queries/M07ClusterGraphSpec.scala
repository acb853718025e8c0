package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** m07's cluster-graph CC (optimization r18): the unified components are
  * computed over the (media cluster ↔ text cluster) co-membership graph
  * instead of the 3n-row doc↔cluster bipartite graph. Correctness rests on
  * two facts this spec pins row-for-row against the r17 bipartite
  * formulation (kept verbatim below):
  *
  *  - membership equivalence: two docs are bipartite-connected iff their
  *    mclusters are cluster-graph-connected (a doc's two cluster nodes are
  *    directly linked; doc hops contribute nothing else);
  *  - label equivalence: the min doc id of a unified component equals the
  *    min mcluster in it (every doc d has mcluster(d) ≤ d inside the same
  *    component, and each mcluster value is itself a member doc's id), and
  *    m-node ids sort below t-node ids by the namespace bases.
  */
class M07ClusterGraphSpec extends SparkSpec {

  private val MBase = 1099511627776L
  private val TBase = 2199023255552L

  /** The r17 bipartite formulation over the same materialized label
    * tables. */
  private def m07Bipartite(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val media = MultimodalQueries.m04MediaDupClusters.run(s, dir)
      .select(col("doc_id"), col("cluster").as("mcluster"))
    val text = SimilarityQueries.clusterLabels(s, dir, ptauOnly = true)
      .select(col("id").as("doc_id"), col("cluster").as("tcluster"))
    val assets = media.join(text, Seq("doc_id"), "left")
    val fwd = assets
      .select(col("doc_id").as("src"), (col("mcluster") + lit(MBase)).as("dst"))
      .union(assets.filter(col("tcluster").isNotNull)
        .select(col("doc_id").as("src"), (col("tcluster") + lit(TBase)).as("dst")))
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
    val nodes = assets.select(col("doc_id").as("id"))
      .union(fwd.select(col("dst").as("id"))).distinct()
    val labels = graft.operators.ConnectedComponents.label(nodes, edges)
      .filter(col("id") < MBase)
      .select(col("id").as("doc_id"), col("cluster"))
    val sizes = labels.groupBy(col("cluster"))
      .agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "cluster")
      .join(assets, Seq("doc_id"))
      .select(col("doc_id"), col("mcluster"), col("tcluster"), col("cluster"),
        col("cluster_size"),
        (col("doc_id") === col("cluster")).cast("int").as("is_canonical"))
      .orderBy(col("doc_id"))
  }

  test("cluster-graph m07 equals the bipartite formulation row-for-row") {
    val dir = "/root/testdata/sf0.001"
    val old = m07Bipartite(spark, dir).collect().map(_.mkString("|")).toSeq
    val now = MultimodalQueries.m07CrossmodalDedup.run(spark, dir)
      .collect().map(_.mkString("|")).toSeq
    assert(old.nonEmpty)
    assert(now == old,
      s"cluster-graph m07 diverged: new-only=${now.diff(old).take(3)} " +
        s"old-only=${old.diff(now).take(3)}")
  }
}
