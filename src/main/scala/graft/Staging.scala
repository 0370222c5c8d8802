package graft

import org.apache.spark.sql.DataFrame

/** ONE definition of staged-artifact materialization (round-10 verdict #6).
  *
  * Every build-once-serve-many intermediate (signatures, posting lists,
  * quantizer cells, edge lists, per-round fixpoint state) goes through
  * here instead of calling `localCheckpoint` at ~86 independent sites, so
  * the persistence backend is a deployment decision, not a code rewrite:
  *
  *  - `local` (default): `Dataset.localCheckpoint` — executor-local
  *    blocks, zero HDFS dependency, right for local[] and for clusters
  *    that accept recomputing a lost artifact from source (the lineage is
  *    truncated, so an executor loss during a SERVE phase fails the query
  *    rather than silently recomputing — acceptable for derived artifacts
  *    that a retry rebuilds).
  *  - `reliable`: `Dataset.checkpoint` — writes to
  *    `SparkContext.setCheckpointDir` (HDFS/S3), survives executor loss;
  *    the 1000-executor deployment switch. Requires the deployment to set
  *    a checkpoint dir; we deliberately do NOT default it (a silent local
  *    path would masquerade as durable).
  *
  * Switch: `spark.conf.set("spark.graft.staging.backend", "reliable")`.
  * Executor-loss semantics per backend are documented in SCALE.md §Staging.
  *
  * Two entry points because call sites need two different stats behaviors:
  * `checkpoint` keeps the checkpointed plan's sizeInBytes (small staged
  * artifacts stay broadcast-eligible); `checkpointStatsReset` additionally
  * rebuilds the frame from the checkpointed RDD, resetting the stats
  * estimate — required by iterative self-joining rounds, where the carried
  * estimate compounds exponentially (see the Borůvka BigInt pathology
  * note below).
  */
object Staging {

  /** Session conf key selecting the backend: `local` (default) | `reliable`. */
  val BackendKey = "spark.graft.staging.backend"

  private def raw(df: DataFrame, eager: Boolean): DataFrame =
    df.sparkSession.conf.get(BackendKey, "local") match {
      case "reliable" => df.checkpoint(eager)
      case _ => df.localCheckpoint(eager)
    }

  /** Backend-switched checkpoint; the drop-in replacement for
    * `df.localCheckpoint(eager)` (plan stats carried through unchanged).
    */
  def checkpoint(df: DataFrame, eager: Boolean = true): DataFrame = raw(df, eager)

  /** Backend-switched checkpoint + stats reset for iterative programs.
    *
    * A checkpoint truncates lineage but CARRIES the checkpointed plan's
    * sizeInBytes estimate into the LogicalRDD, and Spark's size-only join
    * estimate is the PRODUCT of the children — so an iterative algorithm
    * whose round references its own checkpointed output more than once
    * compounds the estimate's DIGIT COUNT exponentially (measured:
    * Borůvka's 6 self-joins/round × 4 rounds reached a ~2^24-digit BigInt
    * and the driver burned 15+ minutes inside BigInteger.multiply in
    * SizeInBytesOnlyStatsPlanVisitor before any job ran). Rebuilding the
    * frame from the checkpointed RDD resets the estimate to the session
    * default — O(1) stats per round, plan-level only; the data stays the
    * checkpointed RDD and laziness is preserved (an eager=false checkpoint
    * still materializes at the round's action).
    */
  def checkpointStatsReset(df: DataFrame, eager: Boolean = true): DataFrame = {
    val c = raw(df, eager)
    // internal-row rebuild: same stats reset, no external-Row codec pass
    // on every downstream read (graftbridge.InternalFrames doc)
    org.apache.spark.sql.graftbridge.InternalFrames.statsReset(c)
  }

  /** `df.staged()` enrichment so the 80+ chained call sites keep their
    * postfix shape (`x.groupBy(...).agg(...).staged()`).
    */
  implicit class StagedDataFrame(private val df: DataFrame) extends AnyVal {
    def staged(eager: Boolean = true): DataFrame = checkpoint(df, eager)
  }
}
