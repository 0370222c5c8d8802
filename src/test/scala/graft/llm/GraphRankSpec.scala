package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins GraphRank.pagerank on a hand-computed graph (exact scaled-integer
  * ranks, so expectations are literal BIGINTs, not tolerances) plus the
  * invariants the integer formulation guarantees: rank mass never exceeds
  * SCALE and only shrinks by bounded truncation, and a sink-free cycle
  * preserves the uniform fixed point exactly.
  */
class GraphRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def nodesDf(ids: Long*) = ids.toDF("id")
  private def edgesDf(e: (Long, Long)*) = e.toDF("src", "dst")

  test("3-node cycle holds the uniform fixed point exactly") {
    // 0→1→2→0: outdeg 1 everywhere, inflow(v) = rank(u) exactly, so
    // r' = (15·t + 85·t) div 100 with t = SCALE div 3 stays t forever —
    // any drift is an arithmetic bug, not rounding.
    val t = GraphRank.Scale / 3
    val r = GraphRank
      .pagerank(nodesDf(0L, 1L, 2L), edgesDf(0L -> 1L, 1L -> 2L, 2L -> 0L), iters = 4)
      .orderBy("id").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(r.toSeq == Seq((0L, t), (1L, t), (2L, t)))
  }

  test("star graph: hub collects, leaves hold teleport floor; mass conserved within truncation bound") {
    // 1,2,3 → 0; 0 → 1. Hand-iterate the integer recurrence once:
    //   t = SCALE div 4; r1(0) = (15t + 85·3t) div 100; r1(1) = t;
    //   r1(2) = r1(3) = (15t) div 100.
    val t = GraphRank.Scale / 4
    val exp0 = (15 * t + 85 * 3 * t) / 100
    val expLeaf = (15 * t) / 100
    val out = GraphRank
      .pagerank(nodesDf(0L, 1L, 2L, 3L), edgesDf(1L -> 0L, 2L -> 0L, 3L -> 0L, 0L -> 1L), iters = 1)
      .orderBy("id").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(out.toSeq == Seq((0L, exp0), (1L, t), (2L, expLeaf), (3L, expLeaf)))

    // Mass: total never exceeds SCALE, and per-iteration truncation loses
    // < (outdeg + 2) units per node — over i iterations and n nodes the
    // floor is SCALE - i * n * (maxOutdeg + 2).
    val r5 = GraphRank
      .pagerank(nodesDf(0L, 1L, 2L, 3L), edgesDf(1L -> 0L, 2L -> 0L, 3L -> 0L, 0L -> 1L), iters = 5)
      .agg(sum("rank")).head.getLong(0)
    assert(r5 <= GraphRank.Scale)
    assert(r5 >= GraphRank.Scale - 5L * 4L * 5L)
  }

  test("parallel edges collapse and self-loops are legal") {
    // Duplicate 0→1 must count once (outdeg(0) = 1, full mass forwarded);
    // the 1→1 self-loop feeds rank back without error.
    val t = GraphRank.Scale / 2
    val out = GraphRank
      .pagerank(nodesDf(0L, 1L), edgesDf(0L -> 1L, 0L -> 1L, 1L -> 1L), iters = 1)
      .orderBy("id").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(out.toSeq == Seq(
      (0L, (15 * t) / 100),              // no inflow: teleport only
      (1L, (15 * t + 85 * (t + t)) / 100))) // from 0 plus its own loop
  }

  test("iteration joins are equi-joins; only the one-row teleport broadcasts") {
    val plan = GraphRank
      .pagerank(nodesDf(0L, 1L, 2L), edgesDf(0L -> 1L, 1L -> 2L, 2L -> 0L), iters = 3)
      .queryExecution.executedPlan.toString
    // The only nested-loop allowed is the broadcast of the single-row
    // teleport aggregate; rank × edges must stay a hash/sort-merge join.
    val nested = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    val crossish = "CartesianProduct".r.findAllIn(plan).size
    assert(crossish == 0, s"cartesian in pagerank plan:\n$plan")
    // 3 iterations + init each cross-join the broadcast teleport row.
    assert(nested <= 4, s"unexpected nested loops:\n$plan")
  }

  test("q_graph_adamic_adar: independent Scala replay of the AA top-20 from the mutual edges") {
    val sf = "/root/testdata/sf0.001"
    val sess = spark.newSession()
    // The mutual-graph query shares the staged edge artifact the AA query
    // composes, so both views of the graph are the same construction.
    val edges = graft.SparkEntry.queries("q_ann_knn_graph")(sess, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = (edges ++ edges.map(_.swap))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val adjacent = edges.toSet
    val deg = nbrs.map { case (n, s) => n -> s.size.toLong }
    // AA replay: for every shared neighbor z, every non-adjacent neighbor
    // pair (a < b) of z collects 1e12 div ln_micro(deg z).
    val acc = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    for ((z, ns) <- nbrs; a <- ns; b <- ns if a < b && !adjacent((a, b))) {
      val w = 1000000000000L / NeutralMath.lnScaledJvm(deg(z), 1L, 1.0e6)
      val (c, s) = acc.getOrElse((a, b), (0L, 0L))
      acc((a, b)) = (c + 1, s + w)
    }
    val expTop = acc.toSeq
      .map { case ((a, b), (c, s)) => (a, b, c, s) }
      .sortBy { case (a, b, _, s) => (-s, a, b) }
      .take(20)
    val got = graft.SparkEntry.queries("q_graph_adamic_adar")(sess, sf)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.length == expTop.length)
    got.zip(expTop).foreach { case ((ga, gb, gc, gs), (ea, eb, ec, es)) =>
      assert((ga, gb, gc) == (ea, eb, ec))
      assert(math.abs(gs - es / 1.0e12) < 1e-4)
    }
  }

  test("q_graph_triangles: independent Scala replay of the census from the mutual edges") {
    val sf = "/root/testdata/sf0.001"
    val sess = spark.newSession()
    val edges = graft.SparkEntry.queries("q_ann_knn_graph")(sess, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adjacent = edges.toSet
    val nbrs = (edges ++ edges.map(_.swap))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    // Ordered-triple replay: a < b < c with all three edges present.
    val tris = for {
      (a, b) <- edges
      c <- nbrs(b) if b < c && adjacent((a, c))
    } yield (a, b, c)
    val perNode = tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    val deg = nbrs.map { case (n, s) => n -> s.size.toLong }
    val expTop = deg.keys.toSeq
      .map(n => (n, deg(n), perNode.getOrElse(n, 0L)))
      .sortBy { case (n, _, t) => (-t, n) }
      .take(20)
    val got = graft.SparkEntry.queries("q_graph_triangles")(sess, sf).collect()
    assert(got.length == expTop.length)
    got.zip(expTop).foreach { case (r, (n, dg, t)) =>
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == (n, dg, t))
      val expCoef =
        if (dg < 2) 0.0
        else (2 * t).toDouble / (dg * (dg - 1))
      assert(r.getDouble(4) == expCoef)
      assert(r.getLong(5) == tris.length.toLong)
    }
  }

  test("q_graph_ppr: JVM replay of the seeded integer recurrence; output excludes seeds") {
    val sf = "/root/testdata/sf0.001"
    val sess = spark.newSession()
    val ids = graft.queries.Tables.documents(sess, sf)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val n = ids.length.toLong
    val edges = ids.flatMap(id => (0 to 2).map(j =>
      id -> ((id * id * 31 + (2 * j + 1) * 97) % n))).distinct
    val seeds = ids.filter(_ % 29 == 0).toSet
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.length.toLong }
    val tele = GraphRank.Scale / seeds.size
    var rank = ids.map(i => i -> (if (seeds(i)) tele else 0L)).toMap
    for (_ <- 1 to 5) {
      val inflow = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s, d) <- edges) inflow(d) += rank(s) / outdeg(s)
      rank = ids.map(i => i ->
        ((15 * (if (seeds(i)) tele else 0L) + 85 * inflow(i)) / 100)).toMap
    }
    val exp = ids.filterNot(seeds).map(i => (i, rank(i)))
      .sortBy { case (i, r) => (-r, i) }.take(15)
      .zipWithIndex.map { case ((i, r), k) => (k + 1, i, r) }
    val got = graft.SparkEntry.queries("q_graph_ppr")(sess, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == exp.toSeq, s"got ${got.toSeq}\nexp ${exp.toSeq}")
    // personalization is non-vacuous: rank reached beyond the seed set
    assert(exp.head._3 > 0, "no rank mass escaped the seeds")
    // mass conservation: the walk never mints mass
    assert(rank.values.sum <= GraphRank.Scale)
  }

  test("q_graph_kcore: JVM peeling replay; layers partition the node set") {
    val sf = "/root/testdata/sf0.001"
    val sess = spark.newSession()
    val pairs = graft.SparkEntry.queries("q_ann_knn_graph")(sess, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // undirected peeling, k = 2, 6 synchronous rounds — mirrors kcoreTail
    var edges = (pairs ++ pairs.map(_.swap)).toSet
    val all = edges.map(_._1)
    val peel = scala.collection.mutable.Map.empty[Long, Int]
    var alive = all
    for (round <- 1 to 6) {
      val deg = edges.toSeq.groupBy(_._1).map { case (n, es) => n -> es.size }
      val survivors = alive.filter(n => deg.getOrElse(n, 0) >= 2)
      for (n <- alive -- survivors) peel(n) = round
      edges = edges.filter { case (a, b) => survivors(a) && survivors(b) }
      alive = survivors
    }
    for (n <- alive) peel(n) = 7
    val exp = peel.groupBy(_._2).map { case (r, m) =>
      val ns = m.keys.toSeq
      (r, ns.size.toLong, ns.min, ns.max, ns.sum)
    }.toSeq.sortBy(_._1)
    val got = graft.SparkEntry.queries("q_graph_kcore")(sess, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == exp, s"census mismatch: got ${got.toSeq} exp $exp")
    // the decomposition is non-vacuous on this fixture: something is
    // peeled AND a 3-core survives
    assert(exp.exists(_._1 < 7) && exp.exists(_._1 == 7),
      s"peeling is vacuous: $exp")
    // layers partition all nodes
    assert(exp.map(_._2).sum == all.size.toLong)
  }

  test("q_graph_label_prop: independent Scala replay of 3 synchronous rounds") {
    val sf = "/root/testdata/sf0.001"
    val sess = spark.newSession()
    val edges = graft.SparkEntry.queries("q_ann_knn_graph")(sess, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = (edges ++ edges.map(_.swap))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSeq }
    // Synchronous LPA: neighbors' labels + one self-vote, most frequent
    // wins, ties to the smallest label — the query's exact rule.
    var lbl: Map[Long, Long] = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      lbl = nbrs.map { case (n, ns) =>
        val votes = (ns.map(lbl) :+ lbl(n))
          .groupBy(identity).map { case (l, xs) => (l, xs.size) }
        n -> votes.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
    }
    val comm = lbl.groupBy(_._2)
      .map { case (l, m) => (l, m.size.toLong, m.keys.min) }
    val expTop = comm.toSeq.sortBy { case (l, n, _) => (-n, l) }.take(20)
    val got = graft.SparkEntry.queries("q_graph_label_prop")(sess, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length == expTop.length && got.nonEmpty)
    got.zip(expTop).foreach { case ((gl, gn, gm, gt), (el, en, em)) =>
      assert((gl, gn, gm) == (el, en, em))
      assert(gt == comm.size.toLong)
    }
    // communities partition the node set, and LPA must be at least as
    // fine as connected components (it can only split, never merge)
    assert(comm.map(_._2).sum == nbrs.size)
  }

  test("q_graph_modularity: exact integer replay from the LPA labels; bounds hold") {
    val sf = "/root/testdata/sf0.001"
    val sess = spark.newSession()
    val edges = graft.SparkEntry.queries("q_ann_knn_graph")(sess, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = (edges ++ edges.map(_.swap))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSeq }
    var lbl: Map[Long, Long] = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      lbl = nbrs.map { case (n, ns) =>
        val votes = (ns.map(lbl) :+ lbl(n))
          .groupBy(identity).map { case (l, xs) => (l, xs.size) }
        n -> votes.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
    }
    val m = edges.length.toLong
    val eIn = edges.filter { case (a, b) => lbl(a) == lbl(b) }
      .groupBy { case (a, _) => lbl(a) }.view.mapValues(_.length.toLong).toMap
    val byC = lbl.groupBy(_._2).map { case (c, mem) =>
      val degSum = mem.keys.toSeq.map(n => nbrs(n).size.toLong).sum
      val e = eIn.getOrElse(c, 0L)
      (c, mem.size.toLong, e, degSum, 4 * m * e - degSum * degSum)
    }
    val qTotal = byC.map(_._5).sum
    val expTop = byC.toSeq.sortBy { case (c, n, _, _, _) => (-n, c) }.take(20)

    val got = graft.SparkEntry.queries("q_graph_modularity")(sess, sf).collect()
    assert(got.length == expTop.length && got.nonEmpty)
    got.zip(expTop).foreach { case (r, (c, nm, e, ds, qn)) =>
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
        ((c, nm, e, ds, qn)), s"row ${r.toSeq}\nexp ${(c, nm, e, ds, qn)}")
      assert(r.getLong(6) == qTotal)
      assert(r.getDouble(7) == qTotal.toDouble / (4.0 * m.toDouble * m.toDouble))
    }
    // handshake: community degree sums cover 2m exactly; Q in (-1/2, 1]
    assert(byC.map(_._4).sum == 2 * m)
    val q = qTotal.toDouble / (4.0 * m * m)
    assert(q > -0.5 && q <= 1.0, s"modularity $q out of range")
  }

  test("hits: star graph separates the hub and authority roles exactly") {
    // 1,2,3 → 0 and 0 → 1. Hand-iterate h0=1000 twice:
    //   round 1: a = Aᵀh → a(0)=3000, a(1)=1000; h = A·a → h(0)=a(1)=1000,
    //            h(1)=h(2)=h(3)=a(0)=3000.
    //   round 2: a(0)=h(1)+h(2)+h(3)=9000, a(1)=h(0)=1000;
    //            h(0)=a(1)=1000, h(1..3)=a(0)=9000.
    val out = GraphRank
      .hits(nodesDf(0L, 1L, 2L, 3L), edgesDf(1L -> 0L, 2L -> 0L, 3L -> 0L, 0L -> 1L), iters = 2)
      .orderBy("id").collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(out.toSeq == Seq((0L, 9000L, 1000L), (1L, 1000L, 9000L),
      (2L, 0L, 9000L), (3L, 0L, 9000L)))
  }

  test("q_graph_hits: JVM replay of 3 rounds over the synthetic citation graph") {
    val sf = "/root/testdata/sf0.001"
    val sess = spark.newSession()
    val ids = graft.queries.Tables.documents(sess, sf)
      .select("doc_id").collect().map(_.getLong(0))
    val n = ids.length.toLong
    val edges = (for (src <- ids; j <- 0 to 2)
      yield (src, (src * src * 31 + (2 * j + 1) * 97) % n)).distinct
    val outNbrs = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSeq }
    val inNbrs = edges.groupBy(_._2).map { case (d, es) => d -> es.map(_._1).toSeq }
    var h: Map[Long, Long] = ids.map(_ -> 1000L).toMap
    var a: Map[Long, Long] = ids.map(_ -> 0L).toMap
    for (_ <- 1 to 3) {
      a = ids.map(v => v -> inNbrs.getOrElse(v, Seq.empty).map(h).sum).toMap
      h = ids.map(v => v -> outNbrs.getOrElse(v, Seq.empty).map(a).sum).toMap
    }
    val exp = ids.map(v => (v, a(v), h(v)))
      .sortBy { case (id, av, _) => (-av, id) }.take(15)
      .zipWithIndex.map { case ((id, av, hv), i) => (i + 1, id, av, hv) }

    val got = graft.SparkEntry.queries("q_graph_hits")(sess, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == exp.toSeq, s"got ${got.toSeq}\nexp ${exp.toSeq}")
    // the two roles genuinely differ somewhere — HITS earns its second score
    assert(ids.exists(v => a(v) != h(v)), "auth == hub everywhere — roles collapsed")
  }

  test("bfsHops: hand graph — distances propagate, horizon respected, unreached stay null") {
    // seeds {0}; chain 0→1→2→3 plus isolated 4. After 2 rounds: hops
    // 0,1,2 are fixed, 3 is beyond the horizon, 4 unreachable.
    val out = GraphRank
      .bfsHops(nodesDf(0L, 1L, 2L, 3L, 4L),
        edgesDf(0L -> 1L, 1L -> 2L, 2L -> 3L),
        nodesDf(0L), iters = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(out.toSeq == Seq((0L, Some(0L)), (1L, Some(1L)), (2L, Some(2L)),
      (3L, None), (4L, None)))
  }

  test("q_graph_label_spread: JVM replay of 3 clamped rounds; spread beats chance") {
    val sf = "/root/testdata/sf0.001"
    val sess = spark.newSession()
    val me = {
      graft.llm.LlmQueries.knnEdgesCached(sess, sf).createOrReplaceTempView("g_edges")
      sess.sql("""SELECT a.src, a.dst FROM g_edges a JOIN g_edges b
                 |ON a.src = b.dst AND a.dst = b.src AND a.src < a.dst""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    val nbrs = (me ++ me.map(_.swap)).groupBy(_._1)
      .map { case (n, es) => n -> es.map(_._2).toSeq }
    val truth = graft.queries.Tables.embeddings(sess, sf)
      .selectExpr("vec_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    var labs: Map[Long, Int] = truth.filter(_._1 % 4 != 0)
    val seeds = labs
    for (_ <- 1 to 3) {
      val pred = nbrs.keys.filter(_ % 4 == 0).flatMap { v =>
        val votes = nbrs(v).flatMap(labs.get)
          .groupBy(identity).map { case (l, g) => (l, g.size) }
        if (votes.isEmpty) None
        else Some(v -> votes.toSeq.sortBy { case (l, c) => (-c, l) }.head._1)
      }.toMap
      labs = seeds ++ pred
    }
    val hold = truth.filter(_._1 % 4 == 0)
    val exp = hold.groupBy(_._2).toSeq.sortBy(_._1).map { case (l, g) =>
      val predd = g.keys.toSeq.flatMap(id => labs.get(id).map(id -> _))
      val correct = predd.count { case (id, pl) => pl == truth(id) }
      (l, g.size.toLong, predd.size.toLong, correct.toLong,
        10000L * correct / math.max(1L, predd.size))
    }
    val got = graft.SparkEntry.queries("q_graph_label_spread")(sess, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == exp, s"got ${got.toSeq}\nexp $exp")
    // the spread earns its keep: aggregate accuracy beats the majority-
    // class baseline over PREDICTED nodes
    val nPred = exp.map(_._3).sum; val nCorr = exp.map(_._4).sum
    val priors = hold.groupBy(_._2).view.mapValues(_.size).toMap
    val basel = 10000L * priors.values.max / hold.size
    assert(nPred > 0 && 10000L * nCorr / nPred > basel,
      s"spread acc ${10000L * nCorr / nPred} bp <= majority baseline $basel bp")
  }

  test("q_graph_seed_distance: JVM Bellman-Ford replay of 5 rounds; census partitions nodes") {
    val sf = "/root/testdata/sf0.001"
    val sess = spark.newSession()
    val ids = graft.queries.Tables.documents(sess, sf)
      .select("doc_id").collect().map(_.getLong(0))
    val n = ids.length.toLong
    val edges = (for (src <- ids; j <- 0 to 2)
      yield (src, (src * src * 31 + (2 * j + 1) * 97) % n)).distinct
    val inN = edges.groupBy(_._2).map { case (d, es) => d -> es.map(_._1).toSeq }
    var hop: Map[Long, Long] = ids.filter(_ % 29 == 0).map(_ -> 0L).toMap
    for (_ <- 1 to 5) {
      hop = ids.flatMap { v =>
        val viaIn = inN.getOrElse(v, Seq.empty).flatMap(u => hop.get(u)).map(_ + 1)
        val cands = hop.get(v).toSeq ++ viaIn
        if (cands.isEmpty) None else Some(v -> cands.min)
      }.toMap
    }
    val exp = ids.map(v => (hop.getOrElse(v, -1L), v))
      .groupBy(_._1).toSeq.sortBy(_._1).map { case (h, g) =>
        (h.toInt, g.length.toLong, g.map(_._2).min, g.map(_._2).max, g.map(_._2).sum)
      }
    val got = graft.SparkEntry.queries("q_graph_seed_distance")(sess, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == exp, s"got ${got.toSeq}\nexp $exp")
    // census partitions the node set and the frontier actually expanded
    assert(exp.map(_._2).sum == ids.length.toLong)
    assert(exp.exists(r => r._1 >= 2), "no node beyond hop 1 — trivial graph")
  }
}
