package graft.queries

import org.apache.spark.sql.DataFrame
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
  * window. The scale shape instead works straight off the raw rows:
  *
  *   1. per-group min / max / count          — 3-row hash agg
  *   2. route rows into B ordered histogram buckets — pure projection
  *   3. per-(g, bucket) counts               — hash agg, <= B rows/group,
  *                                             map-side combined
  *   4. cumulative over buckets              — the only per-group window,
  *                                             bounded at B rows at ANY N
  *   5. exact refinement inside just each threshold's boundary bucket
  *                                             (~N/B rows, broadcast-joined)
  *   6. broadcast thresholds back, clamp, hash-agg the winsorized sum
  *
  * Three column-pruned scans of the fact table replace one global sort.
  * Bucket routing divides in double but only ROUTES: decimal -> double is
  * monotonic, so bucket ids are monotonic in x and the refined result is
  * exact wherever float fuzz lands a boundary. Money stays in lossless
  * DECIMAL(18,2) (the clamp is CASE/when; sums convert to DOUBLE only at
  * the output edge), so the result is bit-identical to the sequential
  * window oracle.
  */
object ExactQuantile {

  /** raw: (g: any, x: decimal). Returns one row per group:
    * (g, n_rows, p01, p99, wsum) with p01/p99 the exact 1st/99th discrete
    * percentiles and wsum the sum with x clamped into [p01, p99].
    */
  def winsorizedSums(raw: DataFrame, buckets: Int = 1024): DataFrame = {
    val r = raw.select(col("g"), col("x"))

    val stats = r.groupBy("g").agg(
      min("x").as("mn"), max("x").as("mx"), count(lit(1)).as("ntot"))

    // Monotonic double routing; +1e-9 keeps single-value groups (mx = mn)
    // off the divide-by-zero path and x = mx strictly under bucket B.
    val rb = r.join(broadcast(stats.select("g", "mn", "mx")), "g")
      .withColumn("b", least(greatest(floor(
        (col("x").cast("double") - col("mn").cast("double")) /
          ((col("mx").cast("double") - col("mn").cast("double") + 1e-9) / buckets)),
        lit(0)), lit(buckets - 1)).cast("int"))
      .select("g", "b", "x")

    val bh = rb.groupBy(col("g"), col("b")).agg(count(lit(1)).as("bc"))
    val overBuckets = Window.partitionBy("g").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bh
      .withColumn("cum", sum("bc").over(overBuckets))
      .withColumn("off", col("cum") - col("bc"))
      .join(broadcast(stats.select(col("g"), col("ntot"))), "g")
      .withColumn("k_lo", expr("(ntot + 99) div 100"))
      .withColumn("k_hi", expr("(99 * ntot + 99) div 100"))

    // Each threshold's boundary bucket: the first whose cumulative reaches
    // k. One pass — a UNION of two filters would duplicate the whole
    // histogram subtree (Catalyst inlines, so each branch re-scans and
    // re-aggregates the fact table).
    val bounds = cum
      .select(col("g"), col("b"), col("off"), explode(array(
        when(col("off") < col("k_lo") && col("k_lo") <= col("cum"),
          struct(lit("lo").as("which"), col("k_lo").as("k"))),
        when(col("off") < col("k_hi") && col("k_hi") <= col("cum"),
          struct(lit("hi").as("which"), col("k_hi").as("k"))))).as("wk"))
      .filter(col("wk").isNotNull)
      .select(col("g"), col("b"), col("wk.which").as("which"),
        col("wk.k").as("k"), col("off"))

    // Refine within boundary buckets only: compress the ~N/B surviving rows
    // to per-value counts, then the smallest x whose in-bucket cumulative,
    // offset by the buckets before, reaches k.
    val inBucket = Window.partitionBy("g", "which").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val thr = rb
      .join(broadcast(bounds), Seq("g", "b"))
      .groupBy("g", "which", "k", "off", "x").agg(count(lit(1)).as("c"))
      .withColumn("cumIn", sum("c").over(inBucket))
      .filter(col("off") + col("cumIn") >= col("k"))
      .groupBy("g", "which").agg(min("x").as("v"))
      .groupBy("g").agg(
        min(when(col("which") === "lo", col("v"))).as("lo"),
        min(when(col("which") === "hi", col("v"))).as("hi"))

    r.join(broadcast(thr), "g")
      .withColumn("cx",
        when(col("x") < col("lo"), col("lo"))
          .when(col("x") > col("hi"), col("hi"))
          .otherwise(col("x")))
      .groupBy("g").agg(
        count(lit(1)).as("n_rows"),
        max("lo").cast("double").as("p01"),
        max("hi").cast("double").as("p99"),
        sum(col("cx")).cast("double").as("wsum"))
      .select("g", "n_rows", "p01", "p99", "wsum")
      .orderBy("g")
  }
}
