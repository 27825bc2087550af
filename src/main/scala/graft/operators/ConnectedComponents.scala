package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the
  * duplicate-grouping step of entity dedup
  * (entity_deduplication.py:274-369: similarity pairs → groups).
  *
  * component(node) = minimum node id reachable — the same fixpoint a
  * transitive-closure formulation defines, computed here by repeated
  * (label ⋈ edges → min) rounds with an early-exit convergence check.
  * Each round is one shuffle on the node key; rounds needed = graph
  * diameter (dedup clusters are tiny, so 2-4 in practice). This is the
  * GraphFrames/Pregel pattern without the dependency.
  */
object ConnectedComponents {

  /** @param edges undirected edge list (any orderable node type)
    * @return (node, comp) — comp = min reachable node id
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 20): DataFrame = {
    val und = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionByName(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
      .cache()
    var labels = und.select(col("src").as("node")).distinct()
      .withColumn("comp", col("node"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val neighborMin = und
        .join(labels.withColumnRenamed("node", "dst")
          .withColumnRenamed("comp", "dst_comp"), Seq("dst"))
        .groupBy(col("src").as("node"))
        .agg(min(col("dst_comp")).as("nbr_comp"))
      val updated = labels.join(neighborMin, Seq("node"), "left")
        .withColumn("new_comp", least(col("comp"), coalesce(col("nbr_comp"), col("comp"))))
      val nChanged = updated.where(col("new_comp") =!= col("comp")).count()
      // localCheckpoint truncates the lineage — the plan otherwise
      // doubles per round and the plan-string alone OOMs by ~10 rounds
      val next = updated.select(col("node"), col("new_comp").as("comp"))
        .localCheckpoint(true)
      labels.unpersist()
      labels = next
      converged = nChanged == 0
      iter += 1
    }
    und.unpersist()
    labels
  }
}
