package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.TestSpark

/** Full Scala replay of the unigram-LM tokenizer E-step: candidate
  * costs through the JVM log-kernel twin, Viterbi with the exact
  * (cost, piece, prev) tie order, backtrace, and hard-EM counts —
  * integer-exact comparison of the top-20.
  */
class UnigramTokSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark.newSession()

  test("q_text_unigram_tok_em: exact Viterbi segmentation and piece-count replay") {
    val wt = graft.queries.Tables.documents(spark, sf)
      .selectExpr("explode(split(text, ' ')) AS word").collect()
      .map(_.getString(0)).groupBy(identity).map { case (w, v) => w -> v.length.toLong }

    // candidate costs
    val cand = wt.toSeq.flatMap { case (w, c) =>
      for (j <- 1 to w.length; l <- 1 to 4 if j + l - 1 <= w.length)
        yield (w.substring(j - 1, j + l - 1), c)
    }
    val cd = cand.groupBy(_._1).map { case (p, v) => p -> v.map(_._2).sum }
    val t = cd.values.sum
    val cost = cd.map { case (p, c) => p -> NeutralMath.lnScaledJvm(t, c, 1e6) }

    // Viterbi per word type with the SQL's exact tie order
    def segment(w: String): Option[List[String]] = {
      if (w.length > 16 || w.isEmpty) return None
      // best(pos) = (cost, piece, prev)
      val best = Array.fill[Option[(Long, String, Int)]](w.length + 1)(None)
      best(0) = Some((0L, "", -1))
      for (j <- 1 to w.length) {
        val cands = for {
          prev <- math.max(0, j - 4) until j
          b <- best(prev).toSeq
          piece = w.substring(prev, j)
        } yield (b._1 + cost(piece), piece, prev)
        best(j) = Some(cands.minBy(x => (x._1, x._2, x._3)))
      }
      var pos = w.length
      var out = List.empty[String]
      while (pos > 0) {
        val (_, piece, prev) = best(pos).get
        out = piece :: out
        pos = prev
      }
      Some(out)
    }

    val counts = scala.collection.mutable.Map.empty[String, (Long, Set[String])]
    for ((w, c) <- wt; seg <- segment(w); p <- seg) {
      val (tc, ws) = counts.getOrElse(p, (0L, Set.empty[String]))
      counts(p) = (tc + c, ws + w)
    }
    val total = counts.values.map(_._1).sum
    val expected = counts.toSeq
      .map { case (p, (tc, ws)) => (p, ws.size.toLong, tc) }
      .sortBy { case (p, _, tc) => (-tc, p) }.take(20)

    val got = SparkEntry.queries("q_text_unigram_tok_em")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case ((rk, p, nw, tc, bp), (ep, enw, etc)) =>
      assert(p == ep, s"rank $rk piece")
      assert(nw == enw && tc == etc, s"rank $rk counts")
      assert(bp == tc * 10000L / total, s"rank $rk share")
    }
  }
}
