package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Independent JVM replay of the PMI collocation miner: re-derives the
  * bigram type counts, left/right margins, and micro-nat PMIs through
  * the same NeutralMath JVM kernel, then the support gate + top-20 —
  * formula-level evidence the DuckDB oracle (engine agreement only)
  * cannot give.
  */
class TextMiningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("q_text_pmi_collocations: full JVM replay of counts, margins and kernel PMIs") {
    val sess = spark.newSession()
    val texts = graft.queries.Tables.documents(sess, sf)
      .select("text").collect().map(_.getString(0))

    val bg = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    for (t <- texts; w = t.split(" ", -1); i <- 0 until w.length - 1)
      bg((w(i), w(i + 1))) += 1
    val c1 = bg.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
    val c2 = bg.groupBy(_._1._2).map { case (b, m) => b -> m.values.sum }
    val n = bg.values.sum
    val exp = bg.toSeq.collect { case ((a, b), c) if c >= 5 =>
      (a, b, c, NeutralMath.lnScaledJvm(c * n, c1(a) * c2(b), 1e6))
    }.sortBy { case (a, b, _, p) => (-p, a, b) }.take(20)
      .zipWithIndex.map { case ((a, b, c, p), i) => (i + 1, a, b, c, p) }

    val got = graft.SparkEntry.queries("q_text_pmi_collocations")(sess, sf)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == exp, s"got ${got.toSeq}\nexp $exp")
    // non-vacuous: the miner surfaces pairs co-occurring above chance
    assert(exp.nonEmpty && exp.head._5 > 0, "no above-chance collocation found")
  }

  test("q_text_good_turing: freq-of-freq replay; GT identities hold") {
    val sess = spark.newSession()
    val texts = graft.queries.Tables.documents(sess, sf)
      .select("text").collect().map(_.getString(0))

    val wc = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for (t <- texts; w <- t.split(" ", -1)) wc(w) += 1
    val ff = wc.values.groupBy(identity).map { case (r, g) => r -> g.size.toLong }
    val n = wc.values.sum
    val n1 = ff.getOrElse(1L, 0L)
    val exp = ff.toSeq.sortBy(_._1).take(15).map { case (r, nr) =>
      val rStar = ff.get(r + 1).map(nr1 => (r + 1) * 1000L * nr1 / nr)
      (r, nr, rStar, 1000000L * n1 / n)
    }

    val got = graft.SparkEntry.queries("q_text_good_turing")(sess, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3)))
    assert(got.toSeq == exp, s"got ${got.toSeq}\nexp $exp")

    // GT sanity: p₀ = N₁/N is a proper fraction (the sf0.001 synthetic
    // vocabulary happens to have NO singleton types, so p₀ = 0 there —
    // the sf0.01/sf0.1 oracle runs exercise the nonzero branch), and at
    // least one smoothed count exists and stays positive
    val p0 = exp.head._4
    assert(p0 >= 0 && p0 < 1000000L, s"unseen mass $p0 micro outside [0,1)")
    assert(p0 == 1000000L * n1 / n)
    val stars = exp.flatMap(_._3)
    assert(stars.nonEmpty && stars.forall(_ > 0),
      s"no usable smoothed counts: $stars")
  }

  test("q_text_textrank: JVM replay of the integer recurrence over the word graph") {
    val sess = spark.newSession()
    val texts = graft.queries.Tables.documents(sess, sf)
      .select("text").collect().map(_.getString(0))
    val pairs = (for (t <- texts; w = t.split(" ", -1); i <- 0 until w.length - 1)
      yield (w(i), w(i + 1))).distinct
    val vocab = (pairs.map(_._1) ++ pairs.map(_._2)).distinct.sorted
    val id = vocab.zipWithIndex.map { case (w, i) => w -> (i + 1).toLong }.toMap
    val ed = pairs.map { case (a, b) => (id(a), id(b)) }.filter(p => p._1 != p._2)
    val und = (ed ++ ed.map(_.swap)).distinct
    val out = und.groupBy(_._1).map { case (s0, es) => s0 -> es.map(_._2).toSeq }
    val n = vocab.length.toLong
    val scale = 1000000000000L
    val tele = scale / n
    var rank: Map[Long, Long] = id.values.map(_ -> tele).toMap
    for (_ <- 1 to 5) {
      val inflow = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s0, ds) <- out; contrib = rank(s0) / ds.length; d0 <- ds)
        inflow(d0) += contrib
      rank = id.values.map(v => v -> ((15 * tele + 85 * inflow(v)) / 100)).toMap
    }
    val exp = vocab.map(w => (w, rank(id(w))))
      .sortBy { case (w, r) => (-r, w) }.take(20)
      .zipWithIndex.map { case ((w, r), i) => (i + 1, w, r) }

    val got = graft.SparkEntry.queries("q_text_textrank")(sess, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == exp.toSeq, s"got ${got.take(5).toSeq}\nexp ${exp.take(5)}")
    // ranks vary — the graph structure is doing work beyond frequency
    assert(exp.map(_._3).distinct.length > 1)
  }

  test("q_text_js_divergence: kernel replay of all pairs; JSD bounds and symmetry base") {
    val sess = spark.newSession()
    val docs = graft.queries.Tables.documents(sess, sf)
      .select("source", "text").collect().map(r => (r.getString(0), r.getString(1)))
    val cnt = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    for ((src, t) <- docs; w <- t.split(" ", -1)) cnt((src, w)) += 1
    val bySrc = cnt.groupBy(_._1._1)
      .map { case (s0, m) => s0 -> m.map { case ((_, w), c) => w -> c }.toMap }
    val tot = bySrc.view.mapValues(_.values.sum).toMap
    val sources = bySrc.keys.toSeq.sorted

    def klMicro(pSrc: String, qSrc: String): Long = {
      val (p, q) = (bySrc(pSrc), bySrc(qSrc))
      val (np, nq) = (tot(pSrc), tot(qSrc))
      val s = p.map { case (w, ca) =>
        val cb = q.getOrElse(w, 0L)
        ca * NeutralMath.lnScaledJvm(2 * ca * nq, ca * nq + cb * np, 1e6)
      }.sum
      math.max(0L, math.floor(s.toDouble / np + 0.5).toLong)
    }
    val exp = (for {
      a <- sources; b <- sources if a < b
    } yield {
      val (klp, klq) = (klMicro(a, b), klMicro(b, a))
      (a, b, klp, klq, math.floor((klp.toDouble + klq.toDouble) / 2.0 + 0.5).toLong)
    }).sortBy(r => (r._1, r._2))

    val got = graft.SparkEntry.queries("q_text_js_divergence")(sess, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == exp, s"got ${got.take(3).toSeq}...\nexp ${exp.take(3)}...")
    // JSD is bounded by ln 2 (693147 micro) and the matrix is non-degenerate
    assert(exp.forall(r => r._5 >= 0 && r._5 <= 693147 + 5), "JSD outside [0, ln 2]")
    assert(exp.map(_._5).distinct.length > 1, "all pairs equally divergent — dead signal")
    assert(exp.length == sources.length * (sources.length - 1) / 2)
  }

  test("q_text_judge_kappa: 2x2 contingency replay; kappa corrects below raw agreement") {
    val sess = spark.newSession()
    val docs = graft.queries.Tables.documents(sess, sf)
      .select("text").collect().map(_.getString(0))
    val stop = Set("the", "a", "of", "and", "in", "to", "be", "that")
    val judged = docs.map { t =>
      val w = t.split(" ", -1)
      val n = w.length.toLong
      val sw = w.count(stop).toLong
      val dn = w.distinct.length.toLong
      val sumlen = w.map(_.length.toLong).sum
      val ja = if (n >= 20 && n <= 80 && sw >= 2) 1 else 0
      val jb = if (5 * dn >= n && 10 * sumlen >= 30 * n && 10 * sumlen <= 100 * n) 1 else 0
      (ja, jb)
    }
    val n = judged.length.toLong
    val n11 = judged.count(_ == ((1, 1))).toLong
    val n10 = judged.count(_ == ((1, 0))).toLong
    val n01 = judged.count(_ == ((0, 1))).toLong
    val n00 = judged.count(_ == ((0, 0))).toLong
    val pe2 = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    val knum = n * (n11 + n00) - pe2
    val kden = n * n - pe2
    val exp = (n, n11, n10, n01, n00, knum, kden,
      (n11 + n00).toDouble / n.toDouble,
      if (kden == 0) 0.0 else knum.toDouble / kden.toDouble)

    val got = graft.SparkEntry.queries("q_text_judge_kappa")(sess, sf).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6), r.getDouble(7), r.getDouble(8)) == exp,
      s"got ${r.toSeq}\nexp $exp")
    // kappa never exceeds raw agreement (chance correction only subtracts)
    // and sits in [-1, 1]; both judges must actually fire on the fixture
    assert(r.getDouble(8) <= r.getDouble(7) + 1e-12)
    assert(r.getDouble(8) >= -1.0 && r.getDouble(8) <= 1.0)
    assert(n11 + n10 > 0 && n11 + n01 > 0, "a judge never fired — dead comparison")
  }
}
