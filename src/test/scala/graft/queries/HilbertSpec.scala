package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the Hilbert layout key three ways: (1) the JVM reference
  * implements BOTH directions (xy→d and d→xy) and must round-trip, with
  * consecutive d values always landing on grid NEIGHBORS — the defining
  * unit-step property Morton lacks; (2) the SQL recurrence must equal the
  * JVM reference on the sampled fixture (formula-level evidence beyond
  * the DuckDB engine-agreement hash); (3) the locality claim that
  * justifies choosing Hilbert over Z-order is MEASURED: over a dense
  * grid, Hilbert-sorted runs have a strictly smaller total bounding-box
  * envelope than Morton-sorted runs of the same length.
  */
class HilbertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"
  private val N = 65536

  /** Canonical xy2d (order 16). */
  private def xy2d(x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = N / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s.toLong * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = N - 1 - x; y = N - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  /** Canonical d2xy (order 16) — the inverse walk. */
  private def d2xy(d0: Long): (Long, Long) = {
    var (x, y, t) = (0L, 0L, d0)
    var s = 1L
    while (s < N) {
      val rx = (t / 2) % 2
      val ry = (t ^ rx) % 2
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s *= 2
    }
    (x, y)
  }

  test("round-trip and unit-step: consecutive keys are always grid neighbors") {
    // sweep a low range and a high-bit range of the 2^32 key space
    val ranges = Seq(0L until 4096L, (1L << 31) until ((1L << 31) + 2048L))
    for (r <- ranges) {
      var prev = d2xy(r.head)
      assert(xy2d(prev._1, prev._2) == r.head)
      for (d <- r.tail) {
        val cur = d2xy(d)
        assert(xy2d(cur._1, cur._2) == d, s"round-trip broke at d=$d")
        val step = math.abs(cur._1 - prev._1) + math.abs(cur._2 - prev._2)
        assert(step == 1, s"jump of $step between d=${d - 1} and d=$d")
        prev = cur
      }
    }
  }

  test("q_layout_hilbert: SQL recurrence equals the canonical JVM transform") {
    val sess = spark.newSession()
    val got = graft.SparkEntry.queries("q_layout_hilbert")(sess, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    for ((k, x, y, hkey) <- got)
      assert(hkey == xy2d(x, y), s"order $k: sql $hkey != jvm ${xy2d(x, y)} at ($x,$y)")
    // keys vary (the sample is not degenerate)
    assert(got.map(_._4).distinct.length > got.length / 2)
  }

  test("hilbert runs have tighter bounding envelopes than morton runs") {
    // dense 64x64 grid (scaled into the order-16 domain so both curves
    // see the same points), chopped into 48-cell runs in each curve's
    // order: sum of per-run bounding-box areas — the row-group min/max
    // envelope a scan would prune against. Hilbert must beat Morton.
    // (A power-of-two run length would align BOTH curves to perfect
    // quads and tie; real row groups are never quad-aligned.)
    val scale = N / 64
    val pts = for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong * scale, y.toLong * scale)
    def morton(x: Long, y: Long): Long = {
      var m = 0L
      for (b <- 0 until 16)
        m |= (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
      m
    }
    def envelope(sorted: Seq[(Long, Long)]): Long =
      sorted.grouped(48).map { run =>
        val xs = run.map(_._1); val ys = run.map(_._2)
        (xs.max - xs.min + scale) * (ys.max - ys.min + scale)
      }.sum
    val eh = envelope(pts.sortBy { case (x, y) => xy2d(x, y) })
    val em = envelope(pts.sortBy { case (x, y) => morton(x, y) })
    assert(eh < em, s"hilbert envelope $eh not tighter than morton $em")
  }
}
