package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame

/** Internal-row rebuild of a DataFrame — the stats-reset step of
  * [[graft.Staging.checkpointStatsReset]] without the external-Row
  * codec round trip.
  *
  * The public rebuild (`createDataFrame(df.rdd, df.schema)`) deserializes
  * every InternalRow to an external Row and re-encodes it on every
  * downstream read — a per-row, non-codegen cost paid by EVERY iterative
  * round that resets stats (Borůvka, CC pointer jumping, k-core peels).
  * `internalCreateDataFrame` wraps the checkpointed InternalRow RDD
  * directly: same LogicalRDD-with-default-stats result (the estimate
  * reset the iterative self-joins need), zero row conversion. The RDD
  * rows are safe to share — Dataset.checkpoint/localCheckpoint already
  * copies each UnsafeRow into the checkpointed RDD.
  */
object InternalFrames {

  /** Contract: the input must be a checkpoint-produced frame (as
    * [[graft.Staging.checkpointStatsReset]] guarantees) — its `toRdd`
    * yields already-copied UnsafeRows. Called on an arbitrary frame, the
    * wrapped RDD could expose per-partition reused row buffers to anyone
    * who persists or collects it directly.
    */
  def statsReset(df: DataFrame): DataFrame = {
    require(checkpointRdd(df).isDefined,
      "InternalFrames.statsReset requires a checkpoint-produced frame (LogicalRDD plan)")
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(df.queryExecution.toRdd, df.schema)
  }

  /** The persisted RDD behind a checkpoint-produced frame (a `LogicalRDD`
    * plan, as `Dataset.checkpoint`/`localCheckpoint` return), or None for
    * any other plan shape. This is the handle [[graft.Staging]] needs to
    * unpersist a staged frame's blocks explicitly once its consumers are
    * done — `queryExecution.toRdd` would return a *derived*
    * mapPartitions RDD whose unpersist is a no-op.
    */
  def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }
}
