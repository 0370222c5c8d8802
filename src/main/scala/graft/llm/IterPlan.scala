package graft.llm

import org.apache.spark.sql.DataFrame

/** Checkpoint helpers for iterative DataFrame programs.
  *
  * `Dataset.localCheckpoint` truncates lineage but CARRIES the
  * checkpointed plan's sizeInBytes estimate into the LogicalRDD, and
  * Spark's size-only join estimate is the PRODUCT of the children — so an
  * iterative algorithm whose round references its own checkpointed output
  * more than once compounds the estimate's DIGIT COUNT exponentially
  * (measured: Borůvka's 6 self-joins/round × 4 rounds reached a
  * ~2^24-digit BigInt and the driver burned 15+ minutes inside
  * BigInteger.multiply in SizeInBytesOnlyStatsPlanVisitor before any job
  * ran; connected-components labels hit the same wall at ~15+ fixpoint
  * rounds on forest-shaped graphs). Rebuilding the frame from the
  * checkpointed RDD resets the estimate to the session default — O(1)
  * stats per round, plan-level only; the data stays the checkpointed RDD
  * and laziness is preserved (an eager=false checkpoint still
  * materializes at the round's action).
  */
private[llm] object IterPlan {

  def cpReset(df: DataFrame, eager: Boolean = true): DataFrame = {
    val c = df.localCheckpoint(eager)
    c.sparkSession.createDataFrame(c.rdd, c.schema)
  }
}
