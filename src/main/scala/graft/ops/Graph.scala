package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the graph
  * step a dedup pipeline runs AFTER pair generation: near-dup pairs are
  * edges, each component keeps its minimum doc id as the cluster id
  * (and typically only that doc survives).
  *
  * Scale shape: every iteration is one equi-join + one aggregation of
  * the (node, label) frame — distributed end to end; the driver sees
  * only the converged-yet? count. Labels only decrease, so the loop
  * converges in O(component diameter) iterations (near-dup clusters are
  * shallow). `localCheckpoint` truncates the logical plan each round —
  * without it the lineage doubles per iteration and analysis time blows
  * up long before data size matters.
  */
object Graph {

  /** @param edges undirected edges as (id_a, id_b) long columns
    * @param nodes one `id` long column (components of isolated nodes =
    *              themselves)
    * @return (id, component) — component = min id reachable */
  def connectedComponents(edges: DataFrame, nodes: DataFrame,
                          maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
    var labels = nodes.select(col("id"), col("id").as("component"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // smallest label among each node's neighbors
      val neighborMin = sym
        .join(labels.select(col("id").as("dst"), col("component").as("nc")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("nc")).as("nmin"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nmin"), col("component"))).as("component"),
          (col("nmin") < col("component")).as("changed"))
        .localCheckpoint()
      converged = next.filter(col("changed")).isEmpty
      labels = next.select(col("id"), col("component"))
      iter += 1
    }
    labels
  }
}
