package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.TestSpark

/** Full Scala replay of the suffix-order LCP miner: truncated suffixes,
  * 3-char prefix-bucket-local ordering, adjacent cross-document LCPs,
  * exact top-15 comparison — plus the ground-truth property that every
  * reported gram occurs verbatim at both reported positions.
  */
class SuffixLcpSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark.newSession()

  test("q_dedup_suffix_lcp: exact suffix-order replay and occurrence ground truth") {
    val docs = graft.queries.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap

    val suf = docs.toSeq.flatMap { case (id, text) =>
      (1 to text.length).map { pos =>
        (id, pos.toLong, text.substring(pos - 1, math.min(text.length, pos - 1 + 40)))
      }
    }
    val pairs = suf.groupBy(_._3.take(3)).toSeq.flatMap { case (_, g) =>
      val sorted = g.sortBy(x => (x._3, x._1, x._2))
      sorted.sliding(2).collect {
        case Seq((da, pa, sa), (db, pb, sb)) if da != db =>
          val lcp = math.min(sa.zip(sb).takeWhile { case (a, b) => a == b }.length,
            math.min(sa.length, sb.length))
          (lcp.toLong, da, pa, db, pb, sb)
      }
    }
    val expected = pairs.filter(_._1 > 0)
      .sortBy(x => (-x._1, x._4, x._5)).take(15)

    val got = SparkEntry.queries("q_dedup_suffix_lcp")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.length == expected.length.min(15))
    got.zip(expected).foreach { case ((rk, lcp, gram, da, pa, db, pb), e) =>
      assert((lcp, da, pa, db, pb) == ((e._1, e._2, e._3, e._4, e._5)), s"rank $rk pair")
      assert(gram == e._6.take(lcp.toInt), s"rank $rk gram")
      // ground truth: the gram occurs verbatim at BOTH positions
      assert(docs(da).startsWith(gram, pa.toInt - 1), s"rank $rk occurrence a")
      assert(docs(db).startsWith(gram, pb.toInt - 1), s"rank $rk occurrence b")
    }
    // the fixture's synthetic corpus contains long verbatim repeats
    assert(got.head._2 >= 20, s"top lcp ${got.head._2}")
  }
}
