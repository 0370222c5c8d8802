package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.TestSpark

/** Behavioral pins for tokenizer training + inverted-index build. */
class TextIndexSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  test("BPE learns the hand-computed merges, including the overlap rule on 'aaa'") {
    val s = spark.newSession()
    import s.implicits._
    // wt: ab x3, cd x2, aaa x1.
    // Round 1 pairs: (a,b)=3, (c,d)=2, (a,a)=2 -> merge a|b.
    // Round 2 pairs: (c,d)=2, (a,a)=2 -> tie, lexicographic tiebreak -> a|a;
    // 'aaa' has matches at rk 1 and 2 (one run): only rk1 applies -> [aa, a].
    val docs = Seq("ab ab cd", "ab cd", "aaa").toDF("text")
    val out = TextIndex.bpeFromDocs(s, docs)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(out.take(2) == Seq((1, "a|b", 3L), (2, "a|a", 2L)))
    assert(out.drop(2) == Seq(
      (3, "ab", 3L), (3, "c", 2L), (3, "d", 2L), (3, "a", 1L), (3, "aa", 1L)))
  }

  test("BPE encode: per-word token counts reconcile and merges strictly compress") {
    val out = SparkEntry.queries("q_text_bpe_encode")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.nonEmpty)
    val (chars, toks, bp) = (out.head._5, out.head._6, out.head._7)
    out.foreach { case (w, _, nChar, nSym, c2, t2, b2) =>
      assert(nSym <= nChar, s"$w: encode grew the word")
      assert(nSym >= 1)
      assert((c2, t2, b2) == (chars, toks, bp), s"$w: rollup columns differ across rows")
    }
    assert(out.map(o => o._2 * o._3).sum == chars)
    assert(out.map(o => o._2 * o._4).sum == toks)
    assert(toks < chars, "two merges must compress this corpus")
    assert(bp == math.floor(toks.toDouble * 10000 / chars + 0.5).toLong)
  }

  test("inverted index: gaps reconstruct the first postings; df matches distinct docs") {
    // head_gaps is a comma-joined STRING (the driver compare cannot sort
    // array cells — round-8 fix); parse it back for the reconstruction pin
    val out = SparkEntry.queries("q_text_inverted_index")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4).split(',').filter(_.nonEmpty).map(_.toLong).toSeq))
    assert(out.nonEmpty)
    // independent recompute of (term -> sorted doc ids)
    val docsByTerm = graft.queries.Tables.documents(spark, sf)
      .selectExpr("doc_id", "explode(split(text, ' ')) AS term")
      .distinct().collect()
      .map(r => (r.getString(1), r.getLong(0)))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sorted.toSeq }
    out.foreach { case (term, df, varintBytes, bp, headGaps) =>
      val ids = docsByTerm(term)
      assert(df == ids.length, s"$term: df mismatch")
      // cumulative sums of the gap head reconstruct the first postings
      val rebuilt = headGaps.scanLeft(0L)(_ + _).drop(1)
      assert(rebuilt == ids.take(8), s"$term: gap reconstruction broke")
      assert(headGaps.drop(1).forall(_ > 0), s"$term: non-positive gap")
      // varint accounting: recompute from the full gap list
      val gaps = ids.head +: ids.sliding(2).collect { case Seq(a, b) => b - a }.toSeq
      val expectBytes = gaps.map(g =>
        if (g < 128) 1L else if (g < 16384) 2L else if (g < 2097152) 3L else 4L).sum
      assert(varintBytes == expectBytes, s"$term: varint bytes")
      assert(bp == math.floor(varintBytes.toDouble * 10000 / (8 * df) + 0.5).toLong)
      // the reason to delta-encode: gaps cost under half the raw 8-byte ids
      assert(bp < 5000, s"$term: compression did not pay ($bp bp)")
    }
  }
}
