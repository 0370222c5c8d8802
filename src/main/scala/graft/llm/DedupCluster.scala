package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate clustering: connected components over the pair graph,
  * keeping the minimum doc_id as each cluster's representative — the
  * "which copy do we keep" step that follows candidate generation in a
  * dedup pipeline.
  *
  * Algorithm: iterative min-label propagation — each round is a hash join
  * (labels onto neighbors) + groupBy(min), converging in O(graph diameter)
  * rounds; the standard large-scale CC pattern (no driver-side graph).
  * The only driver action per round is the fixpoint check; lineage is cut
  * with localCheckpoint (on a cluster: spark.checkpoint against a durable
  * dir).
  */
object DedupCluster {

  /** pairs(id1 < id2) → (doc_id, cluster_rep). */
  def clusters(pairs: DataFrame): DataFrame = {
    // Materialize the (possibly expensive) pair pipeline ONCE before the
    // union references it twice.
    val p = pairs.select(col("id1"), col("id2")).localCheckpoint(true)
    val edges = p.select(col("id1").as("a"), col("id2").as("b"))
      .union(p.select(col("id2").as("a"), col("id1").as("b")))
      .localCheckpoint(true)

    var labels = edges.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)

    var converged = false
    var rounds = 0
    val maxRounds = 50 // diameter bound; real graphs converge in < log2(n)
    while (!converged && rounds < maxRounds) {
      val neighborMin = edges
        .join(labels, col("b") === col("node"))
        .groupBy(col("a")).agg(min(col("label")).as("nlabel"))
      val updated = labels
        .join(neighborMin, col("node") === col("a"), "left")
        .select(col("node"), col("label"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("next"))
        .localCheckpoint(true)
      converged = updated.filter(col("next") < col("label")).isEmpty
      labels = updated.select(col("node"), col("next").as("label"))
      rounds += 1
    }
    labels.select(col("node").as("doc_id"), col("label").as("cluster_rep"))
      .orderBy("doc_id")
  }
}
