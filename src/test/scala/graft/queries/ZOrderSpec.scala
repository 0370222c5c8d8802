package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The property that makes z-order a layout lever at 100 TB: sorting by
  * the interleaved key clusters BOTH dimensions, so any fixed-size run of
  * rows (≈ a parquet row group) spans a small x-range AND a small
  * y-range — which is what lets min/max stats prune scans on either
  * column. Single-column sorting clusters one dimension and leaves the
  * other spanning the full domain.
  */
class ZOrderSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("z-sorted row groups span a fraction of each dimension's domain") {
    // deterministic synthetic scatter: 4096 points over a 64x64 domain,
    // the two dimensions drawn independently (a multiplicative pattern
    // would silently correlate them and void the comparison)
    val rnd = new scala.util.Random(5)
    val pts = Seq.fill(4096)((rnd.nextInt(64), rnd.nextInt(64)))

    def interleave(v: Int): Long = {
      var s = v.toLong
      s = (s | (s << 8)) & 0x00FF00FFL
      s = (s | (s << 4)) & 0x0F0F0F0FL
      s = (s | (s << 2)) & 0x33333333L
      s = (s | (s << 1)) & 0x55555555L
      s
    }
    def zkey(x: Int, y: Int): Long = interleave(x) | (interleave(y) << 1)

    def meanGroupSpan(sorted: Seq[(Int, Int)], pick: ((Int, Int)) => Int): Double = {
      val groups = sorted.grouped(64).toSeq
      groups.map { g => val vs = g.map(pick); (vs.max - vs.min).toDouble }.sum / groups.size
    }

    val zSorted = pts.sortBy { case (x, y) => zkey(x, y) }
    val xSorted = pts.sortBy(_._1)

    val zx = meanGroupSpan(zSorted, _._1)
    val zy = meanGroupSpan(zSorted, _._2)
    val xy = meanGroupSpan(xSorted, _._2)

    // z-order: BOTH dims cluster — ~1 point per cell means 64 consecutive
    // z-points sit in roughly one 8x8 tile (plus tile-boundary spill)
    assert(zx <= 24 && zy <= 24,
      s"z-sorted groups must span a fraction of each 64-wide dim, got x=$zx y=$zy")
    // single-column sort: the unsorted dim spans ~the whole domain
    assert(xy >= 40, s"x-sorted groups should leave y unclustered, got $xy")

    // and the SQL z-key is the same function as this reference interleave
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val rows = spark.sql(DepthQueries.mortonSpark).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (x, y, z) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(z == zkey(x.toInt, y.toInt), s"SQL zkey mismatch at x=$x y=$y")
    }
  }
}
