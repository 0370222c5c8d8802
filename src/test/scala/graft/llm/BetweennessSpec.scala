package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.TestSpark

/** Full Scala replay of the seed-sampled Brandes estimator: 4-hop BFS
  * with exact path counts, micro-quantized dependency accumulation by
  * decreasing depth, and the top-20 — integer-exact comparison.
  */
class BetweennessSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark.newSession()

  test("q_graph_betweenness: exact BFS-sigma and dependency replay") {
    val n = graft.queries.Tables.documents(spark, sf).count()
    val edges = (0L until n).flatMap { id =>
      (0 to 2).map(j => (id, (id * id * 31 + (2 * j + 1) * 97) % n))
    }.distinct
    val out = edges.groupBy(_._1).map { case (s, v) => s -> v.map(_._2).toSeq }
    val seeds = (0L until n).filter(_ % 499 == 0)

    val bc = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    for (s <- seeds) {
      // level-synchronous BFS with sigma
      val depth = scala.collection.mutable.Map(s -> 0)
      val sig = scala.collection.mutable.Map(s -> 1L)
      var frontier = Seq(s)
      val levels = scala.collection.mutable.ArrayBuffer(Seq(s))
      for (j <- 1 to 4) {
        val nxt = scala.collection.mutable.Map.empty[Long, Long]
        for (v <- frontier; w <- out.getOrElse(v, Nil)) {
          if (!depth.contains(w)) { depth(w) = j; nxt(w) = sig(v) }
          else if (depth(w) == j) nxt(w) += sig(v)
        }
        for ((w, sg) <- nxt) sig(w) = sg
        frontier = nxt.keys.toSeq
        levels += frontier
      }
      // dependency accumulation, micro-quantized per edge term
      val dm = scala.collection.mutable.Map.empty[Long, Long]
      for (w <- levels(4)) dm(w) = 0L
      for (j <- 3 to 1 by -1; v <- levels(j)) {
        val t = out.getOrElse(v, Nil).filter(w => depth.get(w).contains(j + 1))
          .map(w => sig(v) * (1000000L + dm(w)) / sig(w)).sum
        dm(v) = t
      }
      for (j <- 1 to 4; v <- levels(j)) {
        val (b, c) = bc.getOrElse(v, (0L, 0L))
        bc(v) = (b + dm(v), c + 1)
      }
    }
    val expected = bc.toSeq.map { case (v, (b, c)) => (v, b, c) }
      .sortBy(x => (-x._2, x._1)).take(20)

    val got = SparkEntry.queries("q_graph_betweenness")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == expected.length.min(20))
    got.zip(expected).foreach { case ((rk, id, b, c), (eid, eb, ec)) =>
      assert(id == eid, s"rank $rk node")
      assert(b == eb, s"rank $rk betweenness")
      assert(c == ec, s"rank $rk seed coverage")
    }
  }
}
