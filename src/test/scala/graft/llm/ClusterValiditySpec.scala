package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Replays the purity/MI/NMI arithmetic from the exact (cell, label)
  * contingency table the operator folds (same SQL prefix), through the
  * same NeutralMath JVM kernel — formula-level evidence the DuckDB hash
  * (engine agreement only) cannot give — plus the validity-bound
  * invariants that make the numbers mean something.
  */
class ClusterValiditySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("q_cluster_purity: JVM replay from the contingency table; bounds hold") {
    val sess = spark.newSession()
    graft.queries.Tables.registerAll(sess, sf)
    graft.functions.GraftFunctions.register(sess)
    val ct = sess.sql(AnnSql.purityContingencySpark).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))

    val n = ct.map(_._3).sum
    val nc = ct.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nl = ct.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val pure = ct.groupBy(_._1).map(_._2.map(_._3).max).sum
    val iW = ct.map { case (c, l, ncl) =>
      ncl * NeutralMath.lnScaledJvm(ncl * n, nc(c) * nl(l), 1e6)
    }.sum
    val hcW = nc.values.map(x => x * NeutralMath.lnScaledJvm(n, x, 1e6)).sum
    val hlW = nl.values.map(x => x * NeutralMath.lnScaledJvm(n, x, 1e6)).sum
    val miMicro = math.max(0L, math.floor(iW.toDouble / n + 0.5).toLong)
    val hcMicro = hcW / n; val hlMicro = hlW / n
    val nmiMilli = (1000 * miMicro) /
      math.max(1L, math.floor(math.sqrt((hcMicro * hlMicro).toDouble)).toLong)
    val exp = (n, nc.size.toLong, nl.size.toLong, 10000 * pure / n, miMicro, nmiMilli)

    val got = graft.SparkEntry.queries("q_cluster_purity")(sess, sf).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == exp, s"got ${r.toSeq}\nexp $exp")

    // validity bounds: purity at least the majority-label baseline (a
    // single-cluster split achieves exactly that), NMI in [0, ~1]
    val majorityBp = 10000 * nl.values.max / n
    assert(r.getLong(3) >= majorityBp,
      s"purity ${r.getLong(3)} below majority baseline $majorityBp")
    assert(r.getLong(5) >= 0 && r.getLong(5) <= 1050, s"NMI ${r.getLong(5)} out of range")
    // MI respects its entropy ceiling (quantization slack of a few micro)
    assert(miMicro <= math.min(hcMicro, hlMicro) + 5)
  }
}
