package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** ExactQuantile vs a brute-force in-memory reference, covering the edges
  * the histogram path must survive: a single-value group (zero range),
  * groups smaller than the percentile denominator (k_lo = 1), and values
  * landing exactly on bucket boundaries.
  */
class ExactQuantileSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def brute(xs: Seq[BigDecimal]): (BigDecimal, BigDecimal, BigDecimal) = {
    val sorted = xs.sorted
    val n = sorted.size
    def at(k: Long): BigDecimal = sorted((k - 1).toInt)
    val lo = at((n + 99L) / 100L)
    val hi = at((99L * n + 99L) / 100L)
    val w = sorted.map(x => if (x < lo) lo else if (x > hi) hi else x).sum
    (lo, hi, w)
  }

  test("matches brute force incl. single-value and tiny groups") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val big = Seq.fill(2500)(BigDecimal(rng.nextInt(100000)) / 100)
    val tiny = Seq(BigDecimal("5.00"), BigDecimal("1.00"), BigDecimal("9.00"))
    val const = Seq.fill(40)(BigDecimal("3.14"))
    // signed: exercises the negative branch of the digit-bucket id (all
    // negative ids must order below all non-negative ones, increasing
    // toward zero) and zero itself
    val signed = Seq.fill(300)(BigDecimal(rng.nextInt(20000) - 10000) / 100) :+
      BigDecimal("0.00")
    val data =
      big.map(("big", _)) ++ tiny.map(("tiny", _)) ++ const.map(("const", _)) ++
        signed.map(("signed", _))
    val df = data.toDF("g", "x")
      .select($"g", $"x".cast("decimal(18,2)").as("x"))

    val got = ExactQuantile.winsorizedSums(df)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap

    for ((g, xs) <- Seq("big" -> big, "tiny" -> tiny, "const" -> const,
        "signed" -> signed)) {
      val (lo, hi, w) = brute(xs.map(_.setScale(2)))
      val (n, gLo, gHi, gW) = got(g)
      assert(n === xs.size.toLong, s"$g n_rows")
      assert(gLo === lo.toDouble, s"$g p01")
      assert(gHi === hi.toDouble, s"$g p99")
      assert(gW === w.toDouble, s"$g wsum")
    }
  }

  // Property guard for the closed-form clamp correction (wsum computed
  // from histogram + in-bucket prefix sums, never a clamp pass): random
  // group sizes and duplicate-heavy value sets whose cents share leading
  // digits, so boundary buckets hold many distinct repeated values. Any
  // off-by-one in the below/through bookkeeping shows up as a wrong wsum.
  test("closed-form winsorized sum matches brute force on randomized inputs") {
    import spark.implicits._
    // 12 deterministic (size, seed) cases in one Spark job: group = case id
    val cases = (1 to 12).map { i =>
      val rng = new scala.util.Random(1000L + i)
      val n = 1 + rng.nextInt(400)
      // duplicate-heavy: values drawn from a domain ~n/3 wide so boundary
      // buckets contain repeated values (the refinement's hard case)
      val dom = math.max(3, n / 3)
      val xs = Seq.fill(n)(BigDecimal(rng.nextInt(dom) * 25 + rng.nextInt(4)) / 100)
      s"c$i" -> xs
    }
    val df = cases.flatMap { case (g, xs) => xs.map((g, _)) }.toDF("g", "x")
      .select($"g", $"x".cast("decimal(18,2)").as("x"))
    val got = ExactQuantile.winsorizedSums(df)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    for ((g, xs) <- cases) {
      val (lo, hi, w) = brute(xs.map(_.setScale(2)))
      val (n, gLo, gHi, gW) = got(g)
      assert(n === xs.size.toLong, s"$g n_rows")
      assert(gLo === lo.toDouble, s"$g p01")
      assert(gHi === hi.toDouble, s"$g p99")
      assert(gW === w.toDouble, s"$g wsum")
    }
  }
}
