package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge relations — the family
  * [[Dedup.components]] (label propagation) opened; this adds PageRank,
  * the standard "which nodes matter" score over the similarity graphs the
  * ANN family builds (e.g. centrality-weighted sampling of a corpus by
  * its kNN structure).
  *
  * Same iterative discipline as components and [[Similarity.kMeans]]:
  * each round is one join + one hash aggregation over the edge relation,
  * the new rank relation is eagerly `localCheckpoint`ed (plans must not
  * compound across rounds), and nothing data-sized visits the driver.
  * Per-round ranks are rounded to 10 dp so the float sum is
  * order-independent in practice and any engine replays the rounds
  * bit-identically (the oracle unrolls the same rounds in SQL).
  */
object Graphs {

  /** PageRank with damping `d` over directed `edges` (`src`, `dst`):
    * `r₀ = 1`; `r_{t+1}(v) = (1−d) + d·Σ_{u→v} r_t(u)/outdeg(u)`,
    * the non-normalized formulation (fixpoint mean 1). Nodes = every id
    * appearing on either side; sinks contribute nothing (their mass
    * drains — the standard simplification for similarity graphs, where
    * out-degree is k for every node anyway).
    */
  def pageRank(edges: DataFrame, iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0 && damping < 1, s"damping in (0,1), got $damping")
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val out = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint()
    var ranks = nodes.withColumn("r", lit(1.0)).localCheckpoint()
    var i = 0
    while (i < iters) {
      val contrib = e.join(out, "src")
        .join(ranks, e("src") === ranks("id"))
        .select(col("dst").as("id"), (col("r") / col("outdeg")).as("c"))
        .groupBy("id").agg(sum(col("c")).as("s"))
      val next = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"), round(
          lit(1.0 - damping) + lit(damping) * coalesce(col("s"), lit(0.0)),
          10).as("r"))
      val prev = ranks
      ranks = next.localCheckpoint()
      // RDD-level release — Dataset.unpersist no-ops on checkpoint pins
      org.apache.spark.sql.graftshim.CheckpointBridge.unpersistCheckpoint(prev)
      i += 1
    }
    ranks.select(col("id"), round(col("r"), 6).as("pagerank"))
  }

  /** Per-node triangle counts over the undirected simple graph induced by
    * directed `edges` (`src`, `dst`) — the local-density complement to
    * [[pageRank]]'s centrality: in a kNN similarity graph, high triangle
    * participation marks tightly-clustered regions (near-duplicate pockets,
    * topic cores), low marks bridge/outlier vectors.
    *
    * Plan: canonicalize each unordered pair once (`least/greatest` +
    * distinct, self-loops dropped), then enumerate each triangle exactly
    * once in its ascending orientation x<y<z via two equi-joins
    * ((x,y)⋈(y,z) on y, verified by (x,z)), and explode the three corners
    * into one hash aggregation. Every join is an equi-join — no pair
    * blowup — and the join fan-out is bounded by the graph's max degree
    * (for NN-Descent graphs, k plus the reverse-degree cap); general
    * graphs would add degree-orientation first, which this engine's
    * bounded-degree similarity graphs don't need.
    */
  def triangles(edges: DataFrame): DataFrame = {
    val und = edges.select(
        least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint() // read three times by the triangle join
    val tri = und.select(col("u").as("x"), col("v").as("y"))
      .join(und.select(col("u").as("y"), col("v").as("z")), "y")
      .join(und.select(col("u").as("x"), col("v").as("z")), Seq("x", "z"))
    val corners = tri.select(col("x").as("id"))
      .unionByName(tri.select(col("y").as("id")))
      .unionByName(tri.select(col("z").as("id")))
    corners.groupBy("id").agg(count(lit(1)).as("n_tri"))
  }
}
