package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Independent JVM replay of the PMI collocation miner: re-derives the
  * bigram type counts, left/right margins, and micro-nat PMIs through
  * the same NeutralMath JVM kernel, then the support gate + top-20 —
  * formula-level evidence the DuckDB oracle (engine agreement only)
  * cannot give.
  */
class TextMiningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("q_text_pmi_collocations: full JVM replay of counts, margins and kernel PMIs") {
    val sess = spark.newSession()
    val texts = graft.queries.Tables.documents(sess, sf)
      .select("text").collect().map(_.getString(0))

    val bg = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    for (t <- texts; w = t.split(" ", -1); i <- 0 until w.length - 1)
      bg((w(i), w(i + 1))) += 1
    val c1 = bg.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
    val c2 = bg.groupBy(_._1._2).map { case (b, m) => b -> m.values.sum }
    val n = bg.values.sum
    val exp = bg.toSeq.collect { case ((a, b), c) if c >= 5 =>
      (a, b, c, NeutralMath.lnScaledJvm(c * n, c1(a) * c2(b), 1e6))
    }.sortBy { case (a, b, _, p) => (-p, a, b) }.take(20)
      .zipWithIndex.map { case ((a, b, c, p), i) => (i + 1, a, b, c, p) }

    val got = graft.SparkEntry.queries("q_text_pmi_collocations")(sess, sf)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == exp, s"got ${got.toSeq}\nexp $exp")
    // non-vacuous: the miner surfaces pairs co-occurring above chance
    assert(exp.nonEmpty && exp.head._5 > 0, "no above-chance collocation found")
  }
}
