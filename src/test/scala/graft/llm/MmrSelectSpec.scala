package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins q_search_mmr's greedy semantics by replaying the selection in the
  * JVM from the engine's own staged candidate/similarity tables (the
  * integer micro-cosines — so this checks the GREEDY LOGIC independently
  * of the cosine kernel, which CosineSimilaritySpec already pins), plus
  * the properties that make MMR meaningful: the first pick is the pure
  * relevance argmax, every later pick maximizes rel − maxsim among the
  * remaining candidates, and picks are distinct.
  */
class MmrSelectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("q_search_mmr: JVM greedy replay over the staged candidate tables") {
    val sess = spark.newSession()
    val got = graft.SparkEntry.queries("q_search_mmr")(sess, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == Seq(1, 2, 3, 4))
    assert(got.map(_._2).distinct.length == 4, "picks must be distinct")

    // staged tables the query ran against
    val cand = sess.table("mmr_cand").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cand.size == 12)
    val sim = sess.sql(
      """SELECT a.doc_id, b.doc_id,
        |       CAST(FLOOR(graft_cosine(a.embedding, b.embedding) * 1.0E6 + 0.5E0) AS BIGINT)
        |FROM mmr_cand a JOIN mmr_cand b ON a.doc_id != b.doc_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    // greedy replay: pick1 = relevance argmax, then rel - maxsim argmax
    var sel = Vector.empty[Long]
    val exp = (1 to 4).map { i =>
      val rem = cand.keySet -- sel
      val scored = rem.toSeq.map { d =>
        val m = if (sel.isEmpty) cand(d)
        else cand(d) - sel.map(s => sim((d, s))).max
        (d, m)
      }
      val (d, m) = scored.minBy { case (d, m) => (-m, d) }
      sel :+= d
      (i, d, cand(d), m)
    }
    assert(got.toSeq == exp, s"got ${got.toSeq}\nexp $exp")

    // determinism across sessions
    val again = graft.SparkEntry.queries("q_search_mmr")(spark.newSession(), sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(again == got.toSeq)
  }
}
