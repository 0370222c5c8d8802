package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Independent JVM replay of the word-type Naive Bayes quality
  * classifier: re-derives the per-word counts, smoothed log-likelihood
  * ratios (through the same NeutralMath JVM kernel the engines use),
  * per-doc scores, and the per-source rollup — a formula-level check the
  * DuckDB oracle (which only proves engine agreement) cannot give. Plus
  * the invariants that make the operator meaningful: scores vary, both
  * prediction outcomes occur, and the learned filter actually favors the
  * curated sources on the held-out split.
  */
class TextClassifySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"
  private val posSrc = Set("src0", "src1", "src2", "src3")

  test("q_text_nb_quality: full JVM replay of training, smoothing and scoring") {
    val sess = spark.newSession()
    val docs = graft.queries.Tables.documents(sess, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

    // -- train: word counts over doc_id % 3 != 0, Laplace +1 LLRs
    val cp = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val cn = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((id, src, text) <- docs if id % 3 != 0; w <- text.split(" ", -1)) {
      if (posSrc(src)) cp(w) += 1 else cn(w) += 1
    }
    val vocab = (cp.keySet ++ cn.keySet).toSeq
    val np = cp.values.sum; val nn = cn.values.sum; val v = vocab.size.toLong
    val llr = vocab.map(w =>
      w -> NeutralMath.lnScaledJvm(
        (cp(w) + 1) * (nn + v), (cn(w) + 1) * (np + v), 1e6)).toMap

    // -- score the held-out third (OOV tokens drop), roll up per source
    val scored = docs.collect { case (id, src, text) if id % 3 == 0 =>
      val toks = text.split(" ", -1).filter(llr.contains)
      (src, toks.length.toLong, toks.map(llr).sum)
    }.filter(_._2 > 0)
    val exp = scored.groupBy(_._1).map { case (src, rows) =>
      val s = rows.map(_._3)
      (src, rows.length.toLong, s.count(_ > 0).toLong,
        rows.map(_._2).sum, s.sum, s.min, s.max)
    }.toSeq.sortBy(_._1)

    val got = graft.SparkEntry.queries("q_text_nb_quality")(sess, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == exp, s"got ${got.toSeq}\nexp $exp")

    // non-vacuous: scores vary and both prediction outcomes occur
    assert(exp.exists(r => r._6 != r._7), "all scores identical — dead model")
    val (hi, all) = (exp.map(_._3).sum, exp.map(_._2).sum)
    assert(hi > 0 && hi < all, s"degenerate predictions: $hi of $all positive")
    // the filter favors the curated slice: positive-class hit rate beats
    // the negative-class false-positive rate on the held-out split
    val (pos, neg) = exp.partition(r => posSrc(r._1))
    val posRate = pos.map(_._3).sum.toDouble / pos.map(_._2).sum
    val negRate = neg.map(_._3).sum.toDouble / neg.map(_._2).sum
    assert(posRate > negRate,
      s"no separation: pos hit rate $posRate <= neg rate $negRate")
  }

  test("held-out protocol: the SQL text keys both passes on doc_id % 3") {
    val q = graft.SparkEntry.oracleSql("q_text_nb_quality")
    assert(q.contains("doc_id % 3 != 0") && q.contains("doc_id % 3 = 0"))
  }
}
