package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation WITH
  * pointer jumping — the keeper-assignment step of transitive dedup.
  *
  * Plain neighbor propagation needs diameter-many rounds: a 50-node
  * near-dup chain (docA~docB~docC…, common in boilerplate families)
  * silently mis-converges under a 20-round cap. Each round here does
  *   1. neighbor step:  label(x) ← min over neighbors' labels
  *   2. pointer jump:   label(x) ← min(label(x), label(label(x)))
  * Jumping halves the distance to the cluster minimum every round —
  * convergence in O(log diameter), so 20 rounds covers a ~10^6-hop
  * diameter. Per round: one join + one agg + one self-join, lineage
  * truncated via localCheckpoint (without it the plan doubles every
  * round — fatal at real graph sizes). Labels are always node ids, so
  * the jump join's right side is the label table itself.
  */
object ConnectedComponents {

  /** `edges`: two columns (a, b), undirected (symmetrized internally).
    * Returns ((node, cluster) labels, rounds used). Cluster = minimum
    * node id of the component.
    */
  def minLabelWithStats(edges: DataFrame, maxIter: Int = 20): (DataFrame, Int) = {
    val cols = edges.columns
    require(cols.length == 2, s"edges must have exactly 2 columns, got ${cols.mkString(",")}")
    val sym = edges.select(col(cols(0)).as("a"), col(cols(1)).as("b"))
      .union(edges.select(col(cols(1)).as("a"), col(cols(0)).as("b")))
      .cache()
    var labels = sym.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("cluster"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val viaNeighbor = sym
        .join(labels.select(col("node").as("a"), col("cluster").as("nlbl")), "a")
        .select(col("b").as("node"), col("nlbl").as("cluster"), lit(null).cast("long").as("prev"))
      // The previous label rides through the round as max(prev) — unique
      // per node (neighbor rows carry null), so the convergence check
      // below is a filter+count over the already-checkpointed output
      // instead of a join against the previous label table (VERDICT r3
      // #8: the join-based check was a full extra shuffle job per round).
      val prop = labels.select(col("node"), col("cluster"), col("cluster").as("prev"))
        .union(viaNeighbor)
        .groupBy("node").agg(min("cluster").as("cluster"), max("prev").as("prev"))
      // The jump is an identity in round 0 (labels are self) and only
      // starts paying off once labels are ≥2 hops old — skip it there,
      // keeping the small-cluster fast path at one join+agg per round.
      val next = (if (iter < 2) prop
        else prop
          .join(prop.select(col("node").as("cluster"), col("cluster").as("jlbl")),
            Seq("cluster"), "left")
          .select(col("node"),
            least(col("cluster"), coalesce(col("jlbl"), col("cluster"))).as("cluster"),
            col("prev")))
        .localCheckpoint()
      // Every round: the rows are already materialized by the (eager)
      // localCheckpoint, so the count is a cache scan, no shuffle.
      converged = next.filter(col("cluster") =!= col("prev")).isEmpty
      labels = next.select("node", "cluster")
      iter += 1
    }
    sym.unpersist()
    (labels, iter)
  }

  def minLabel(edges: DataFrame, maxIter: Int = 20): DataFrame =
    minLabelWithStats(edges, maxIter)._1
}
