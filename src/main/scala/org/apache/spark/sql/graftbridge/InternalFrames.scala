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

  def statsReset(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(df.queryExecution.toRdd, df.schema)
  }
}
