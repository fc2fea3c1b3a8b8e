package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the cluster step that turns
  * pairwise near-dup candidates ([[TextDedup.minhashLsh]] etc.) into
  * whole duplicate clusters, so "keep one per cluster" dedup is sound
  * even when A~B and B~C but A and C never met in a bucket.
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with its own id; each round every node takes the min of its own label
  * and its neighbors' labels; at fixpoint every node carries the minimum
  * id reachable in its component — a deterministic canonical cluster id,
  * independent of partitioning and iteration count. Convergence is
  * detected by counting strictly-decreased labels per round (labels only
  * ever decrease, so zero changes == fixpoint).
  *
  * Scale posture: each round is one shuffle of the edge list joined to
  * the label table on node id — O(diameter) rounds total. Near-dup
  * components are bucket-generated near-cliques, so the diameter is
  * small (single digits) at any corpus size; for adversarial long-chain
  * graphs the classic alternating large-star/small-star contraction
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14) halves path lengths per round — not needed for dedup
  * workloads. Labels are cached per round and the previous round
  * unpersisted, so lineage stays O(1) deep.
  */
object Clusters {

  /** Label every node of the undirected pair graph with the minimum node
    * id in its connected component.
    *
    * @param pairs one row per undirected edge
    * @param aCol  left node id column (numeric)
    * @param bCol  right node id column (numeric)
    * @return (id, cluster_id, n_members) — one row per node appearing in
    *         any pair; cluster_id = min id in the component
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIters: Int = 50): DataFrame = {
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    val fwd = pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).cache()
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("id").as("nid"), col("label")), col("dst") === col("nid"))
        .groupBy(col("src").as("id")).agg(min(col("label")).as("nbr_min"))
      // prev rides along in the same plan so convergence detection costs
      // a filter on the cached round result, not a second join + job
      val next = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"),
          col("label").as("prev"))
        .cache()
      val changed = next.filter(col("label") < col("prev")).count()
      labels.unpersist()
      labels = next.drop("prev")
      converged = changed == 0L
      it += 1
    }
    edges.unpersist()
    val sizes = labels.groupBy(col("label").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"))
    labels.select(col("id"), col("label").as("cluster_id"))
      .join(sizes, Seq("cluster_id"))
      .select(col("id"), col("cluster_id"), col("n_members"))
  }
}
