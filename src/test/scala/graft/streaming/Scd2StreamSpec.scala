package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.Tables

/** Pins the streaming SCD2 maintainer against an independent JVM replay
  * of the batch interval derivation, and pins the property that makes a
  * STREAMING dimension maintainer trustworthy at all: the final interval
  * set is invariant to micro-batch chopping (state is a change SET, and
  * interval derivation is a pure function of it — arrival order cannot
  * matter).
  */
class Scd2StreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  private def jvmScd2(): Seq[(Long, String, Long, Option[Long], Int)] = {
    val ch = Tables.orders(spark, sf)
      .where("o_custkey % 10 = 0")
      .selectExpr("o_custkey", "unix_micros(CAST(o_orderdate AS TIMESTAMP))",
        "o_orderkey", "o_orderstatus")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    ch.groupBy(_._1).toSeq.flatMap { case (key, rows) =>
      val ded = rows.groupBy(_._2).map { case (_, g) => g.maxBy(_._3) }
        .toSeq.sortBy(_._2)
      val starts = ded.zipWithIndex.collect {
        case ((_, ts, _, attr), i) if i == 0 || ded(i - 1)._4 != attr => (ts, attr)
      }
      starts.zipWithIndex.map { case ((ts, attr), i) =>
        val vto = if (i + 1 < starts.length) Some(starts(i + 1)._1) else None
        (key, attr, ts, vto, if (vto.isEmpty) 1 else 0)
      }
    }.sortBy(r => (r._1, r._3))
  }

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getInt(4))).toSeq

  test("q_stream_scd2: final intervals equal the batch closed form") {
    val sess = spark.newSession()
    val got = collect(EventStream.scd2Stream(sess, sf))
    val exp = jvmScd2()
    assert(got == exp, s"got ${got.take(5)}...\nexp ${exp.take(5)}...")
    // non-vacuous: some key has more than one version and a closed one
    assert(exp.exists(_._5 == 0), "no closed intervals — trivial history")
    assert(exp.groupBy(_._1).exists(_._2.length > 1), "no multi-version key")
  }

  test("q_stream_scd2: invariant to micro-batch chopping (maxFilesPerTrigger=1)") {
    val sess = spark.newSession()
    val whole = collect(EventStream.scd2Stream(sess, sf))
    val chopped = collect(EventStream.scd2Stream(sess, sf, maxFilesPerTrigger = Some(1)))
    assert(whole == chopped, "chopping the stream changed the final dimension")
  }
}
