package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.TestSpark

/** Full Scala replay of the RHO-loss excess-loss selection: bigram type
  * counts, both LM scores through the JVM twin of the neutral log
  * kernel, per-doc sums, the non-negative clamp, and the top-20 —
  * compared EXACTLY (deterministic integer arithmetic end to end).
  */
class RhoSelectSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark.newSession()

  test("q_select_rho: exact replay of both LMs and the excess-loss ranking") {
    val docs = graft.queries.Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

    val bg = docs.flatMap { case (id, src, text) =>
      val w = text.split(" ", -1)
      w.sliding(2).collect { case Array(a, b) => (id, src, a, b) }
    }
    val cb = bg.groupBy(b => (b._3, b._4)).map { case (k, v) => k -> v.length.toLong }
    val cu = cb.groupBy(_._1._1).map { case (w1, v) =>
      w1 -> (v.values.sum, v.size.toLong)
    }
    val np = cb.groupBy(_._1._2).map { case (w2, v) => w2 -> v.size.toLong }
    val b = cb.size.toLong
    val u2 = cb.groupBy(_._1._2).map { case (w2, v) => w2 -> v.values.map(identity).sum }
    val n = cb.values.sum

    val nllKn = cb.map { case ((w1, w2), c) =>
      val (cuc, nf) = cu(w1)
      (w1, w2) -> NeutralMath.lnScaledJvm(
        4L * cuc * b, (4L * c - 3L) * b + 3L * nf * np(w2), 1e6)
    }
    val nllUni = u2.map { case (w2, cw) =>
      w2 -> NeutralMath.lnScaledJvm(n, cw, 1e6)
    }

    val perDoc = bg.groupBy(x => (x._1, x._2)).map { case ((id, src), pairs) =>
      val nBg = pairs.length.toLong
      val knSum = pairs.map(p => nllKn((p._3, p._4))).sum
      val uniSum = pairs.map(p => nllUni(p._4)).sum
      (id, src, nBg, uniSum / nBg, knSum / nBg,
        math.max(0L, uniSum - knSum) / nBg)
    }.toSeq
    val expected = perDoc.sortBy(x => (-x._6, x._1)).take(20)

    val got = SparkEntry.queries("q_select_rho")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.length == 20)
    got.zip(expected).foreach {
      case ((rk, id, src, nBg, ceU, ceK, ex), (eid, esrc, en, eu, ek, ee)) =>
        assert(id == eid, s"rank $rk doc")
        assert(src == esrc && nBg == en, s"rank $rk meta")
        assert(ceU == eu && ceK == ek && ex == ee, s"rank $rk scores")
    }
    // the reference model must dominate on aggregate: mean KN CE < mean
    // unigram CE (richer context strictly reduces cross-entropy here)
    val totKn = perDoc.map(x => x._5 * x._3).sum
    val totUni = perDoc.map(x => x._4 * x._3).sum
    assert(totKn < totUni, "KN bigram should beat the unigram learner corpus-wide")
  }
}
