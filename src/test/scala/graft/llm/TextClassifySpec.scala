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

  /** JVM replay of the shared NB score chain: (label, score_u) per
    * held-out doc with >= 1 in-vocabulary token.
    */
  private def jvmScores(sess: org.apache.spark.sql.SparkSession): Seq[(Int, Long)] = {
    val docs = graft.queries.Tables.documents(sess, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
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
    docs.toSeq.collect { case (id, src, text) if id % 3 == 0 =>
      val toks = text.split(" ", -1).filter(llr.contains)
      (if (posSrc(src)) 1 else 0, toks.length, toks.map(llr).sum)
    }.filter(_._2 > 0).map(r => (r._1, r._3))
  }

  test("q_text_nb_auc: banded Mann-Whitney replay; the filter actually ranks") {
    val sess = spark.newSession()
    val sc = jvmScores(sess)
    val lo = sc.map(_._2).min; val hi = sc.map(_._2).max
    val width = math.max(1L, hi - lo + 1)
    val binned = sc.map { case (y, s) => (y, math.min(255L, (s - lo) * 256 / width)) }
    val np = binned.map(b => b._2 -> 0L).toMap ++
      binned.filter(_._1 == 1).groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nn = binned.map(b => b._2 -> 0L).toMap ++
      binned.filter(_._1 == 0).groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val bins = np.keySet.toSeq.sorted
    var below = 0L; var u2 = 0L
    for (b <- bins) { u2 += np(b) * (2 * below + nn(b)); below += nn(b) }
    val p = binned.count(_._1 == 1).toLong; val n = binned.count(_._1 == 0).toLong
    val exp = (p, n, 1000000L * u2 / (2 * p * n), 1000000L * u2 / (p * n) - 1000000L)

    val got = graft.SparkEntry.queries("q_text_nb_auc")(sess, sf).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == exp,
      s"got ${r.toSeq}\nexp $exp")
    // the trained filter must rank better than chance on the held-out slice
    assert(r.getLong(2) > 500000L, s"AUC ${r.getLong(2)} micro <= 0.5 — filter is noise")
  }

  test("q_text_nb_reliability: 10-bin replay; positive rate rises across the curve") {
    val sess = spark.newSession()
    val sc = jvmScores(sess)
    val lo = sc.map(_._2).min; val hi = sc.map(_._2).max
    val width = math.max(1L, hi - lo + 1)
    val exp = sc.groupBy { case (_, s) => math.min(9L, (s - lo) * 10 / width) }
      .toSeq.sortBy(_._1).map { case (b, rows) =>
        val scores = rows.map(_._2)
        (b.toInt, rows.size.toLong, rows.count(_._1 == 1).toLong,
          10000L * rows.count(_._1 == 1) / rows.size, scores.min, scores.max)
      }
    val got = graft.SparkEntry.queries("q_text_nb_reliability")(sess, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == exp, s"got ${got.toSeq}\nexp $exp")
    // calibration curve is non-degenerate and points the right way
    assert(exp.size >= 3, s"only ${exp.size} occupied bins")
    assert(exp.last._4 > exp.head._4,
      s"top-bin positive rate ${exp.last._4} bp <= bottom ${exp.head._4} bp")
  }

  test("q_text_isotonic_calibrate: minimax SQL equals a sequential JVM PAV stack") {
    val sess = spark.newSession()
    val sc = jvmScores(sess)
    val lo = sc.map(_._2).min; val hi = sc.map(_._2).max
    val width = math.max(1L, hi - lo + 1)
    val bins = sc.groupBy { case (_, s) => math.min(31L, (s - lo) * 32 / width) }
      .toSeq.sortBy(_._1)
      .map { case (b, rows) => (b, rows.size.toLong, rows.count(_._1 == 1).toLong) }
    // the classical pool-adjacent-violators sweep (Ayer et al. 1955),
    // tracking how many BINS each pooled block covers
    case class Block(n: Long, k: Long) { def mu: Double = k.toDouble / n.toDouble }
    val stack2 = scala.collection.mutable.Stack.empty[(Int, Block)] // (#bins, block)
    bins.foreach { case (_, n, k) =>
      var cnt = 1; var blk = Block(n, k)
      while (stack2.nonEmpty && stack2.top._2.mu >= blk.mu) {
        val (c, t) = stack2.pop(); blk = Block(t.n + blk.n, t.k + blk.k); cnt += c
      }
      stack2.push((cnt, blk))
    }
    val isoPerBin = stack2.toSeq.reverse.flatMap { case (c, b) => Seq.fill(c)(b.mu) }
    val expected = bins.zip(isoPerBin).map { case ((b, n, k), mu) =>
      (b.toInt, n, k, 1000L * k / n, math.floor(mu * 1e3 + 0.5).toLong)
    }
    val got = graft.SparkEntry.queries("q_text_isotonic_calibrate")(sess, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expected, s"got ${got.toSeq}\nexp $expected")
    // the defining property: the calibrated curve is non-decreasing
    assert(got.map(_._5).sliding(2).forall {
      case Array(a, b) => a <= b
      case _ => true
    }, "isotonic output must be monotone")
    // and it genuinely pooled at least one violator on this fixture
    assert(got.map(_._4).toSeq != got.map(_._5).toSeq,
      "fixture produced an already-monotone raw curve — PAV untested")
  }

  test("q_text_label_noise: confident-learning cells replay; diagonal dominates") {
    val sess = spark.newSession()
    val sc = jvmScores(sess)
    val pos = sc.filter(_._1 == 1).map(_._2)
    val neg = sc.filter(_._1 == 0).map(_._2)
    val tp = math.floor(pos.sum.toDouble / math.max(1, pos.size) + 0.5).toLong
    val tn = math.floor(neg.sum.toDouble / math.max(1, neg.size) + 0.5).toLong
    val cells = sc.map { case (y, s) =>
      (y, if (s >= tp) 1 else if (s <= tn) 0 else -1)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val confident = cells.collect { case ((_, p), n) if p >= 0 => n }.sum
    val offDiag = cells.collect { case ((y, p), n) if p >= 0 && y != p => n }.sum
    val noiseBp = 10000L * offDiag / math.max(1, confident)
    val exp = cells.toSeq.map { case ((y, p), n) => (y, p, n, noiseBp) }
      .sortBy { case (y, p, _, _) => (y, p) }

    val got = graft.SparkEntry.queries("q_text_label_noise")(sess, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == exp, s"got ${got.toSeq}\nexp $exp")

    // the audit is meaningful: some mass is confident, and agreement
    // dominates the confident region (the labels are not mostly noise)
    assert(confident > 0, "no confident predictions at all")
    assert(noiseBp < 5000L, s"noise $noiseBp bp — labels read as majority-wrong")
    // both confident classes occur (thresholds straddle real mass)
    assert(cells.keys.exists(_._2 == 1) && cells.keys.exists(_._2 == 0))
  }
}
