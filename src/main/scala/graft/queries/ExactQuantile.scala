package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact discrete quantiles (type-1: smallest x with running
  * count >= ceil(p*n)) and winsorized sums, without a per-group global sort
  * and without a value-frequency aggregation.
  *
  * The one-window formulation (SUM(c) OVER (PARTITION BY g ORDER BY x))
  * funnels each group's whole value table through a single task — fine as
  * an oracle, a straggler at 100 TB when there are few groups. And for
  * near-unique values (money columns), the (g, x) frequency-table variant
  * is no better: it hash-aggregates N rows into ~N groups before the
  * window. The scale shape instead works straight off the raw rows, in
  * exactly TWO column-pruned scans of the fact table:
  *
  *   1. route rows into significant-digit histogram buckets (pure
  *      projection — the bucket id needs NO prior min/max pass), then
  *      per-(g, bucket) count + sum — hash agg, map-side combined,
  *      <= ~34k rows/group at ANY N. Group totals (n, sum) roll up from
  *      the bucket table itself; cumulative over buckets is the only
  *      per-group window, bounded by the bucket count.
  *   2. exact refinement inside just each threshold's boundary bucket
  *      (<= 1% relative width, so only the rows tied to ~3 significant
  *      digits of the threshold survive the broadcast-joined filter).
  *
  * Bucketing is base-10 DDSketch-shaped but EXACT integer/string
  * arithmetic, no floats: for cents = x*100 (lossless for scale-2
  * decimals), the id is (digit-count * 1000 + first-3-digits), negated
  * for negative values. Monotonicity in x is by construction (longer
  * digit string => larger magnitude; same length => prefix order =
  * numeric order), which is what lets "buckets before the boundary"
  * stand in for "values below the threshold".
  *
  * There is no clamp pass: with per-bucket and in-bucket prefix sums
  * available, the winsorized sum is algebra —
  *
  *   wsum = total_sum + n_below*lo - sum_below + n_above*hi - sum_above
  *
  * where n/sum_below count x < lo (rows in buckets before lo's boundary
  * bucket, plus the refined in-bucket prefix) and n/sum_above count
  * x > hi symmetrically. Money stays in lossless DECIMAL(18,2) end to end
  * (sums, prefix sums, and the closed-form correction are all decimal/long
  * arithmetic; conversion to DOUBLE happens only at the output edge), so
  * the result is bit-identical to the sequential window oracle.
  */
object ExactQuantile {

  /** Monotone significant-digit bucket id for a scale-<=2 decimal column.
    * cents = x*100 is exact; d = decimal digit count of |cents|; pre =
    * first min(d,3) digits. id = d*1000 + pre, sign-flipped for x < 0
    * (so all negative buckets order below all non-negative ones and
    * increase toward zero). Bounded at ~2*19*900 ids regardless of N.
    */
  private def bucketId(x: Column): Column = {
    def mag(cents: Column): Column = {
      val s = cents.cast("string")
      length(s).cast("bigint") * 1000 + substring(s, 1, 3).cast("bigint")
    }
    val cents = (x * 100).cast("bigint")
    when(cents >= 0, mag(cents)).otherwise(-mag(-cents))
  }

  /** raw: (g: any, x: decimal scale <= 2, non-null). Returns one row per
    * group: (g, n_rows, p01, p99, wsum) with p01/p99 the exact 1st/99th
    * discrete percentiles and wsum the sum with x clamped into [p01, p99].
    */
  def winsorizedSums(raw: DataFrame): DataFrame = {
    val rb = raw.select(col("g"), col("x")).withColumn("b", bucketId(col("x")))

    // Bucket histogram (fact scan #1): <= ~34k rows/group at ANY scale.
    // Group totals do NOT get their own aggregate: ntot/tsum ride the
    // same per-g exchange as the cumulative walk as unbounded-frame
    // windows, so the histogram has ONE consumer chain and needs no
    // materialization barrier (the previous shape paid a separate stats
    // aggregate, two broadcast joins of it, and an eager localCheckpoint
    // to stop re-execution — measured ~0.5 s of extra machinery at sf0.1
    // cold).
    //
    // Measured floor at sf0.1/local[32] (r6): ~2.6 s warm in-process.
    // The two fact scans are SEQUENTIAL by data dependency — the
    // refinement scan's broadcast side (bounds) must materialize before
    // scan #2 starts — and each scan+aggregate job costs ~0.9 s at this
    // fixture (vs 0.26 s for the bare scan: partial-agg + per-stage
    // planning dominate at this tiny size); the remaining ~0.8 s is the
    // window/rollup stages. The shape, not the constants, is what scales:
    // at 100 TB both scans are column-pruned full passes and everything
    // after them is group-cardinality-bounded. Caching the projected
    // fact rows would merge the two scans here but is exactly what a
    // 100 TB run cannot do, so the 2-scan form stays.
    val bh = rb.groupBy(col("g"), col("b"))
      .agg(count(lit(1)).as("bc"), sum("x").as("bs"))

    val overBuckets = Window.partitionBy("g").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val overGroup = Window.partitionBy("g")
    val cum = bh
      .withColumn("cum", sum("bc").over(overBuckets))
      .withColumn("off", col("cum") - col("bc"))
      .withColumn("soff", sum("bs").over(overBuckets) - col("bs"))
      .withColumn("ntot", sum("bc").over(overGroup))
      .withColumn("tsum", sum("bs").over(overGroup))
      .withColumn("k_lo", expr("(ntot + 99) div 100"))
      .withColumn("k_hi", expr("(99 * ntot + 99) div 100"))

    // Each threshold's boundary bucket: the first whose cumulative reaches
    // k. One pass — a UNION of two filters would duplicate the whole
    // histogram subtree. `off`/`soff` carry the count and sum of every
    // row in the buckets strictly before it; ntot/tsum hitch along so the
    // final correction needs no stats join.
    val bounds = cum
      .select(col("g"), col("b"), col("off"), col("soff"),
        col("ntot"), col("tsum"), explode(array(
          when(col("off") < col("k_lo") && col("k_lo") <= col("cum"),
            struct(lit("lo").as("which"), col("k_lo").as("k"))),
          when(col("off") < col("k_hi") && col("k_hi") <= col("cum"),
            struct(lit("hi").as("which"), col("k_hi").as("k"))))).as("wk"))
      .filter(col("wk").isNotNull)
      .select(col("g"), col("b"), col("wk.which").as("which"),
        col("wk.k").as("k"), col("off"), col("soff"), col("ntot"), col("tsum"))

    // Refine within boundary buckets only (fact scan #2): compress the
    // surviving rows to per-value counts + sums, then the threshold is the
    // smallest x whose in-bucket cumulative, offset by the buckets before,
    // reaches k. min_by on x picks that row WITH its prefix aggregates,
    // giving the exact count/sum of rows below (for lo) and through (for
    // hi) the threshold — the clamp correction needs nothing else.
    val inBucket = Window.partitionBy("g", "which").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val thr = rb
      .join(broadcast(bounds), Seq("g", "b"))
      .groupBy("g", "which", "k", "off", "soff", "ntot", "tsum", "x").agg(
        count(lit(1)).as("c"), sum("x").as("s"))
      .withColumn("cumIn", sum("c").over(inBucket))
      .withColumn("sumIn", sum("s").over(inBucket))
      .filter(col("off") + col("cumIn") >= col("k"))
      .groupBy("g", "which").agg(
        min("ntot").as("ntot"),
        min("tsum").as("tsum"),
        min_by(struct(
          col("x").as("v"),
          (col("off") + col("cumIn")).as("nThru"),
          (col("soff") + col("sumIn")).as("sThru"),
          col("c"), col("s")), col("x")).as("t"))
      .groupBy("g").agg(
        min("ntot").as("ntot"),
        min("tsum").as("tsum"),
        min(when(col("which") === "lo", col("t.v"))).as("lo"),
        // rows strictly below lo and their sum (prefix through v minus
        // v's own frequency row)
        min(when(col("which") === "lo", col("t.nThru") - col("t.c")))
          .as("nBelow"),
        min(when(col("which") === "lo", col("t.sThru") - col("t.s")))
          .as("sBelow"),
        min(when(col("which") === "hi", col("t.v"))).as("hi"),
        // rows through hi and their sum; above = ntot/tsum minus these
        min(when(col("which") === "hi", col("t.nThru"))).as("nThruHi"),
        min(when(col("which") === "hi", col("t.sThru"))).as("sThruHi"))

    thr
      .select(
        col("g"),
        col("ntot").as("n_rows"),
        col("lo").cast("double").as("p01"),
        col("hi").cast("double").as("p99"),
        (col("tsum")
          + col("nBelow") * col("lo") - col("sBelow")
          + (col("ntot") - col("nThruHi")) * col("hi")
          - (col("tsum") - col("sThruHi"))).cast("double").as("wsum"))
      .orderBy("g")
  }
}
