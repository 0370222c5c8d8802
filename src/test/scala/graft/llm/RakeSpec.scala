package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.TestSpark

/** Full Scala replay of RAKE: stopword segmentation, deg/freq word
  * scores, phrase scores, and the top-15 — exact integer comparison.
  */
class RakeSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark.newSession()

  test("q_text_rake: exact replay of phrase segmentation and scoring") {
    val docs = graft.queries.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val stop = Set("a", "the")

    // phrases: maximal stopword-free runs per document
    val phrases = docs.flatMap { case (id, text) =>
      val words = text.split(" ", -1)
      val runs = scala.collection.mutable.ArrayBuffer.empty[Vector[String]]
      var cur = Vector.empty[String]
      for (w <- words) {
        if (stop(w)) { if (cur.nonEmpty) runs += cur; cur = Vector.empty }
        else cur :+= w
      }
      if (cur.nonEmpty) runs += cur
      runs.map(r => (id, r))
    }
    val freq = phrases.flatMap(_._2).groupBy(identity)
      .map { case (w, v) => w -> v.length.toLong }
    val deg = phrases.flatMap { case (_, ph) => ph.map(w => w -> ph.length.toLong) }
      .groupBy(_._1).map { case (w, v) => w -> v.map(_._2).sum }
    val wMilli = freq.keys.map(w => w -> deg(w) * 1000L / freq(w)).toMap
    val scored = phrases.filter(_._2.length <= 5).map { case (_, ph) =>
      (ph.mkString(" "), ph.map(wMilli).sum)
    }
    val agg = scored.groupBy(identity)
      .map { case ((p, s), v) => (p, s, v.length.toLong) }.toSeq
    val expected = agg.sortBy { case (p, s, _) => (-s, p) }.take(15)

    val got = SparkEntry.queries("q_text_rake")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length == expected.length.min(15))
    got.zip(expected).foreach { case ((rk, p, nw, no, s), (ep, es, eo)) =>
      assert(p == ep, s"rank $rk phrase")
      assert(s == es, s"rank $rk score")
      assert(no == eo, s"rank $rk occurrences")
      assert(nw == p.split(" ").length.toLong, s"rank $rk word count")
    }
  }
}
