package graft.llm

import org.apache.spark.sql.DataFrame

/** Checkpoint helper for iterative DataFrame programs — now a thin alias
  * for [[graft.Staging.checkpointStatsReset]], the single staging
  * definition (round-10 verdict #6). The BigInt-stats pathology that
  * motivated the reset lives with the implementation's Scaladoc.
  */
private[llm] object IterPlan {

  def cpReset(df: DataFrame, eager: Boolean = true): DataFrame =
    graft.Staging.checkpointStatsReset(df, eager)
}
