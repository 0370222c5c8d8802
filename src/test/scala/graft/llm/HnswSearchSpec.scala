package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Behavior pins for hierarchical graph-routed search (q_ann_hnsw_search). */
class HnswSearchSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  test("levels follow the deterministic geometric draw: each layer ~1/4 of the one below") {
    val s = spark.newSession()
    graft.queries.Tables.registerAll(s, sf)
    val counts = s.sql(
      s"SELECT ${AnnSql.hnswLevelSpark} AS lvl, COUNT(*) AS n FROM embeddings GROUP BY lvl")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    assert(counts.keySet.subsetOf(Set(0, 1, 2, 3)))
    val atLeast1 = total - counts.getOrElse(0, 0L)
    // P(level >= 1) = 1/4; allow generous sampling slack on the fixture
    assert(atLeast1 > total / 8 && atLeast1 < total / 2,
      s"level>=1 count $atLeast1 of $total is not ~1/4")
    // determinism: a second evaluation is identical
    val counts2 = s.sql(
      s"SELECT ${AnnSql.hnswLevelSpark} AS lvl, COUNT(*) AS n FROM embeddings GROUP BY lvl")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts == counts2)
  }

  test("hierarchical search finds the brute top-1 with fewer base-layer hops than the flat walk") {
    val s = spark.newSession()
    val got = graft.SparkEntry.queries("q_ann_hnsw_search")(s, sf).collect()
    assert(got.length == 3)
    assert(got.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    val gotIds = got.map(r => r.getLong(r.fieldIndex("doc_id")))

    // brute ground truth for query vec 7
    val brute = s.sql(
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 7)
         |SELECT c.vec_id FROM q JOIN embeddings c ON c.vec_id != 7
         |ORDER BY graft_cosine(c.embedding, q.qe) DESC, c.vec_id LIMIT 3""".stripMargin)
      .collect().map(_.getLong(0))
    assert(gotIds.head == brute.head,
      s"hierarchical walk missed the exact top-1: got ${gotIds.toSeq} brute ${brute.toSeq}")
    // recall@3 at least as good as the flat 4-hop walk's documented 2/3
    assert(gotIds.toSet.intersect(brute.toSet).size >= 2,
      s"recall@3 below the flat-walk floor: got ${gotIds.toSeq} brute ${brute.toSeq}")
  }

  test("upper-layer edges connect only level>=1 nodes (plus universal self-loops)") {
    val s = spark.newSession()
    graft.SparkEntry.queries("q_ann_hnsw_search")(s, sf) // forces staging
    val lvl = s.sql(
      s"SELECT vec_id, ${AnnSql.hnswLevelSpark} AS lvl FROM embeddings")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val edges = s.table("hnsw_l1").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val real = edges.filter { case (a, b) => a != b }
    assert(real.nonEmpty, "upper layer has no non-loop edges — hierarchy is vacuous")
    for ((a, b) <- real) {
      assert(lvl(a) >= 1 && lvl(b) >= 1, s"edge ($a,$b) touches a level-0 node")
    }
    // self-loops must cover every node (the frontier-keep invariant)
    val loops = edges.collect { case (a, b) if a == b => a }.toSet
    assert(lvl.keySet.subsetOf(loops), "missing self-loops break frontier keep-alive")
  }

  test("three-layer descent: layer-2 edges connect only level>=2 nodes; search keeps the recall bar") {
    val s = spark.newSession()
    val got = graft.SparkEntry.queries("q_ann_hnsw_l2")(s, sf).collect()
    assert(got.length == 3)
    assert(got.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    val gotIds = got.map(r => r.getLong(r.fieldIndex("doc_id")))

    // layer-2 artifact: non-loop edges exist (hierarchy non-vacuous at
    // this fixture) and touch only level >= 2 nodes; self-loops universal
    val lvl = s.sql(
      s"SELECT vec_id, ${AnnSql.hnswLevelSpark} AS lvl FROM embeddings")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val edges = s.table("hnsw_l2").collect().map(r => (r.getLong(0), r.getLong(1)))
    val real = edges.filter { case (a, b) => a != b }
    assert(real.nonEmpty, "layer 2 has no non-loop edges — hierarchy is vacuous")
    for ((a, b) <- real)
      assert(lvl(a) >= 2 && lvl(b) >= 2, s"l2 edge ($a,$b) touches a level<2 node")
    val loops = edges.collect { case (a, b) if a == b => a }.toSet
    assert(lvl.keySet.subsetOf(loops), "missing l2 self-loops break frontier keep-alive")

    // the descent reaches the brute top-1 through the full 3-layer
    // routing (entry -> l2 beam -> l1 beam -> 3-hop base walk)
    val brute = s.sql(
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 7)
         |SELECT c.vec_id FROM q JOIN embeddings c ON c.vec_id != 7
         |ORDER BY graft_cosine(c.embedding, q.qe) DESC, c.vec_id LIMIT 3""".stripMargin)
      .collect().map(_.getLong(0))
    assert(gotIds.head == brute.head,
      s"three-layer walk missed the exact top-1: got ${gotIds.toSeq} brute ${brute.toSeq}")
    assert(gotIds.toSet.intersect(brute.toSet).size >= 2,
      s"recall@3 below the 2-layer floor: got ${gotIds.toSeq} brute ${brute.toSeq}")
    // determinism across sessions
    val again = graft.SparkEntry.queries("q_ann_hnsw_l2")(spark.newSession(), sf)
      .collect().map(_.toString).toSeq
    assert(again == got.map(_.toString).toSeq)
  }
}
