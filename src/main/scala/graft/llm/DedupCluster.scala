package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Staging.StagedDataFrame

/** Near-duplicate clustering: connected components over the pair graph,
  * keeping the minimum doc_id as each cluster's representative — the
  * "which copy do we keep" step that follows candidate generation in a
  * dedup pipeline.
  *
  * Algorithm: min-label propagation with pointer-jumping — each round is
  * (1) a hash join pulling every neighbor's label + groupBy(min), then
  * (2) a shortcut join chasing the new label's own label (l(u) := l(l(u)),
  * Shiloach–Vishkin-style chain halving), so long paths converge in
  * O(log diameter) rounds instead of O(diameter); the standard
  * large-scale CC pattern (no driver-side graph). Each round runs exactly
  * ONE action: the fixpoint aggregate, which also materializes that
  * round's lazy localCheckpoint (on a cluster: spark.checkpoint against a
  * durable dir). Labels are always node ids within the same component and
  * only ever decrease, so the fixpoint is the per-component minimum.
  */
object DedupCluster {

  /** pairs(id1 < id2) → (doc_id, cluster_rep). */
  def clusters(pairs: DataFrame): DataFrame = {
    // Materialize the (possibly expensive) pair pipeline ONCE before the
    // union references it twice.
    val p = pairs.select(col("id1"), col("id2")).staged()
    // The iterative rounds shuffle only the label frontier (|nodes| rows,
    // a sliver of the corpus); run them at a narrow shuffle width and
    // restore afterwards — per-round latency is joins x partitions x
    // scheduling, so width should track frontier size, not the scan
    // default. A production run sizes this to |nodes| / target-partition
    // rows. Each round's single action materializes inside the loop, so
    // the narrowed width is captured by every round's plan.
    val spark = pairs.sparkSession
    val prevWidth = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try clustersLoop(p)
    finally spark.conf.set("spark.sql.shuffle.partitions", prevWidth)
  }

  private def clustersLoop(p: DataFrame): DataFrame = {
    val edges = p.select(col("id1").as("a"), col("id2").as("b"))
      .union(p.select(col("id2").as("a"), col("id1").as("b")))
      .staged()

    var labels = edges.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
      .staged()

    var converged = false
    var rounds = 0
    val maxRounds = 50 // backstop; pointer-jumping converges in ~log2(diameter)
    while (!converged && rounds < maxRounds) {
      val neighborMin = edges
        .join(labels, col("b") === col("node"))
        .groupBy(col("a")).agg(min(col("label")).as("nlabel"))
      val propagated = labels
        .join(neighborMin, col("node") === col("a"), "left")
        .select(col("node"), col("label"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("mid"))
      val lookup = labels.select(col("node").as("jn"), col("label").as("jl"))
      val updated = propagated
        .join(lookup, col("mid") === col("jn"), "left")
        .select(col("node"), col("label"),
          least(col("mid"), coalesce(col("jl"), col("mid"))).as("next"))
        .withColumn("changed", col("next") < col("label"))
        // lazy checkpoint, materialized by the fixpoint action; wrapped in
        // the stats reset because labels are referenced TWICE per round
        // (propagate + lookup), which doubles the carried sizeInBytes
        // estimate's digit count per round — fine for the handful of
        // rounds dedup components need, a driver-stalling BigInt after the
        // ~15+ rounds forest-shaped graphs (q_cluster_single_linkage)
        // take (IterPlan.cpReset doc)
        .transform(d => IterPlan.cpReset(d, eager = false))
      converged = updated.agg(count(when(col("changed"), true))).head.getLong(0) == 0
      labels = updated.select(col("node"), col("next").as("label"))
      rounds += 1
    }
    labels.select(col("node").as("doc_id"), col("label").as("cluster_rep"))
      .orderBy("doc_id")
  }
}
