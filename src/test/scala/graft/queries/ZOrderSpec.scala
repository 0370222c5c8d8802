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

  test("z-layout parquet skips row groups on BOTH dimensions; x-sort cannot prune y") {
    // The payoff the locality property above only implies: write the SAME
    // scatter z-sorted and x-sorted, then count which row groups a
    // min/max-stats reader must scan for a range predicate — the exact
    // mechanism (parquet footer statistics) a 100 TB scan prunes with.
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.functions.col

    def interleave(v: Int): Long = {
      var s = v.toLong
      s = (s | (s << 8)) & 0x00FF00FFL
      s = (s | (s << 4)) & 0x0F0F0F0FL
      s = (s | (s << 2)) & 0x33333333L
      s = (s | (s << 1)) & 0x55555555L
      s
    }
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(32768)((rnd.nextInt(256), rnd.nextInt(256)))
    import spark.implicits._
    val df = pts.map { case (x, y) =>
      (x.toLong, y.toLong, interleave(x) | (interleave(y) << 1))
    }.toDF("x", "y", "z")

    val base = java.nio.file.Paths.get(s"target/fixtures/zorder_prune_${System.nanoTime()}")
    val zDir = base.resolve("zsorted")
    val xDir = base.resolve("xsorted")
    df.repartitionByRange(64, col("z")).sortWithinPartitions("z")
      .write.mode("overwrite").parquet(zDir.toString)
    df.repartitionByRange(64, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xDir.toString)

    /** Per-row-group (min, max) footer statistics of one INT64 column. */
    def rowGroupStats(dir: java.nio.file.Path, column: String): Seq[(Long, Long)] = {
      val conf = new org.apache.hadoop.conf.Configuration()
      val listing = java.nio.file.Files.list(dir)
      val files =
        try listing.iterator().asScala.toSeq
          .filter(_.getFileName.toString.endsWith(".parquet")).sortBy(_.toString)
        finally listing.close()
      files.flatMap { f =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.toString), conf))
        try reader.getFooter.getBlocks.asScala.toSeq.map { block =>
          val c = block.getColumns.asScala
            .find(_.getPath.toDotString == column)
            .getOrElse(fail(s"column $column missing from ${f.getFileName}"))
          val st = c.getStatistics
          (st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
            st.genericGetMax.asInstanceOf[java.lang.Long].longValue())
        }
        finally reader.close()
      }
    }

    // a reader must scan a row group iff its [min, max] intersects the range
    def mustScan(stats: Seq[(Long, Long)], lo: Long, hi: Long): Int =
      stats.count { case (mn, mx) => mx >= lo && mn <= hi }

    val (lo, hi) = (96L, 127L) // an eighth of the 256-wide domain, per dim
    val zX = rowGroupStats(zDir, "x"); val zY = rowGroupStats(zDir, "y")
    val xX = rowGroupStats(xDir, "x"); val xY = rowGroupStats(xDir, "y")
    val total = zX.size
    assert(total >= 32, s"need many row groups for skip evidence, got $total")
    assert(xX.size == total, "both layouts must produce the same group count")

    // single-dim predicates: the z-layout prunes on EITHER column...
    assert(mustScan(zX, lo, hi) < total / 2,
      s"z-layout must skip most groups on x, scans ${mustScan(zX, lo, hi)}/$total")
    assert(mustScan(zY, lo, hi) < total / 2,
      s"z-layout must skip most groups on y, scans ${mustScan(zY, lo, hi)}/$total")
    // ...which no single-column sort can: x-sort leaves y unprunable
    assert(mustScan(xY, lo, hi) == total,
      s"x-sorted groups all span y, expected zero y-pruning")

    // the two-sided predicate (x AND y in range): z prunes with both
    // columns' stats, the single-column layout only with its own
    def twoSided(xs: Seq[(Long, Long)], ys: Seq[(Long, Long)]): Int =
      xs.zip(ys).count { case ((xmn, xmx), (ymn, ymx)) =>
        xmx >= lo && xmn <= hi && ymx >= lo && ymn <= hi
      }
    val zScan = twoSided(zX, zY)
    val xScan = twoSided(xX, xY)
    assert(zScan < xScan,
      s"z-layout must scan strictly fewer groups on the two-sided predicate: z=$zScan x=$xScan")

    val walk = java.nio.file.Files.walk(base)
    try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    finally walk.close()
  }
}
