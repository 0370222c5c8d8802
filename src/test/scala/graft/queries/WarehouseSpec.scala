package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.TestSpark

/** Behavioral pins for the warehouse-maintenance operators — properties
  * the DuckDB hash-compare can't state (interval algebra, balance bounds,
  * water-filling feasibility).
  */
class WarehouseSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  // own session: the service-replay suites register an in-memory `orders`
  // temp view on the shared session, and registerAll's per-(session, dir)
  // guard would then leave it shadowing the fixture table (the hazard
  // GlobalPlanSweepSpec documents)
  private lazy val spark = TestSpark.spark.newSession()

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()

  test("q_dim_scd2: per key — contiguous intervals, one current row, no no-op versions") {
    val out = rows("q_dim_scd2").map(r =>
      (r.getLong(0), r.getString(1),
        r.getAs[java.time.LocalDateTime](2),
        Option(r.getAs[java.time.LocalDateTime](3)), r.getInt(4)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (key, hist0) =>
      val hist = hist0.sortBy(_._3.toString)
      // exactly one open (current) interval, and it is the last one
      assert(hist.count(_._4.isEmpty) == 1, s"key $key: open intervals != 1")
      assert(hist.last._4.isEmpty, s"key $key: current row is not last")
      assert(hist.forall(h => (h._5 == 1) == h._4.isEmpty))
      // contiguity: valid_to of row i equals valid_from of row i+1
      hist.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), s"key $key: gap between versions")
          // no-op collapse: consecutive versions must differ in the attribute
          assert(a._2 != b._2, s"key $key: consecutive versions share attr ${a._2}")
        case _ => ()
      }
    }
  }

  test("q_dim_scd2 equals a brute per-key replay on a sliced subset") {
    // independent oracle-of-the-oracle: replay the change stream per key in
    // plain Scala and compare the version history
    val spark2 = spark
    val orders = Tables.orders(spark2, sf)
      .select("o_custkey", "o_orderdate", "o_orderkey", "o_orderstatus")
      .collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1), r.getLong(2), r.getString(3)))
      .filter(_._1 % 10 == 0)
    val expected = orders.groupBy(_._1).flatMap { case (key, evs) =>
      val compacted = evs.groupBy(_._2).map { case (_, same) =>
        same.maxBy(_._3) // highest seq wins per (key, ts)
      }.toSeq.sortBy(_._2.toString)
      val collapsed = compacted.foldLeft(List.empty[(java.time.LocalDateTime, String)]) {
        case (acc, (_, ts, _, st)) =>
          if (acc.headOption.exists(_._2 == st)) acc else (ts, st) :: acc
      }.reverse
      collapsed.zipWithIndex.map { case ((ts, st), i) =>
        val to = collapsed.lift(i + 1).map(_._1)
        (key, st, ts, to)
      }
    }.toSet
    val got = rows("q_dim_scd2").map(r =>
      (r.getLong(0), r.getString(1), r.getAs[java.time.LocalDateTime](2),
        Option(r.getAs[java.time.LocalDateTime](3)))).toSet
    assert(got == expected)
  }

  test("q_layout_range_partition: 8 ordered, non-overlapping, balanced partitions") {
    val out = rows("q_layout_range_partition").map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSeq == (0 until 8), "pids must be exactly 0..7")
    // value ranges are ordered and non-overlapping
    out.sortBy(_._1).sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._3, s"pid ${a._1} overlaps ${b._1}")
      case _ => ()
    }
    // balance: the planned layout's largest partition is within 2x of the
    // smallest — the property that makes the boundaries worth writing
    val counts = out.map(_._2)
    assert(counts.max <= 2 * counts.min,
      s"unbalanced layout: ${counts.mkString(",")}")
  }

  test("q_mix_unimax: allocations respect caps and exhaust the budget (water-filling invariant)") {
    val out = rows("q_mix_unimax").map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val totalTokens = out.map(_._2).sum
    val budget = math.floor(totalTokens * 0.3 + 0.5).toLong
    val allocSum = out.map(_._4).sum
    out.foreach { case (src, n, cap, alloc, epochsBp) =>
      assert(cap == 2 * n)
      assert(alloc <= cap, s"$src: alloc over the epoch cap")
      assert(epochsBp <= 20000, s"$src: over 2 epochs")
    }
    if (out.forall(o => o._4 == o._3)) {
      // budget exceeds total caps: everything capped is the right answer
      assert(budget >= allocSum)
    } else {
      // budget binds: the water level exhausts it up to K integer-floor
      // remainders, and uncapped sources all sit at the same level
      assert(allocSum <= budget && budget - allocSum <= out.length,
        s"alloc $allocSum vs budget $budget")
      val uncapped = out.filter(o => o._4 < o._3).map(_._4)
      assert(uncapped.distinct.length == 1,
        s"uncapped sources must share the water level: ${uncapped.mkString(",")}")
    }
  }

  test("q_ts_resample_ffill: complete hour spine per user; fill carries the last observation") {
    val out = rows("q_ts_resample_ffill").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (u, rs0) =>
      val rs = rs0.sortBy(_._2)
      // densification: no missing hour between the user's min and max
      assert(rs.map(_._2).toSeq == (rs.head._2 to rs.last._2),
        s"user $u: spine has gaps")
      // endpoints carry data by construction
      assert(rs.head._3 > 0 && rs.last._3 > 0, s"user $u: empty spine edge")
      // forward fill: an observed bin fills with itself, a gap bin carries
      // the most recent observed value
      var last = rs.head._4
      rs.foreach { case (_, hr, n, cents, ff) =>
        if (n > 0) { assert(ff == cents, s"user $u hr $hr: observed bin ff != cents"); last = cents }
        else assert(cents == 0 && ff == last, s"user $u hr $hr: fill broke")
      }
      // there IS something to fill on this fixture
      assert(rs.exists(_._3 == 0), s"user $u: fixture has no gaps to fill")
    }
  }

  test("q_events_attribution: credit conserves per purchase and matches a brute replay") {
    val out = rows("q_events_attribution").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out.nonEmpty)
    // brute replay: every purchase credits floor(10000/k) to each of its
    // k trailing-hour clicks
    val ev = Tables.events(spark, sf)
      .selectExpr("event_id", "user_id", "event_type",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val clicks = ev.filter(_._3 == "click")
    val purchases = ev.filter(_._3 == "purchase")
    val credits = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    purchases.foreach { case (_, pu, _, pus) =>
      val cs = clicks.filter(c => c._2 == pu && c._4 >= pus - 3600000000L && c._4 <= pus)
      if (cs.nonEmpty) {
        val per = 10000L / cs.length
        cs.foreach { c =>
          val (n, bp) = credits.getOrElse(c._1, (0L, 0L))
          credits(c._1) = (n + 1, bp + per)
        }
      }
    }
    assert(out.toSet == credits.map { case (id, (n, bp)) => (id, n, bp) }.toSet)
    // conservation: no purchase hands out more than 10000 bp
    val totalBp = out.map(_._3).sum
    val totalPurchCredited = purchases.count { case (_, pu, _, pus) =>
      clicks.exists(c => c._2 == pu && c._4 >= pus - 3600000000L && c._4 <= pus)
    }
    assert(totalBp <= totalPurchCredited * 10000L)
    assert(totalBp > (totalPurchCredited * 10000L * 9) / 10,
      "floor residue should stay under 10% of the credit mass")
  }

  test("q_ts_anomaly_zscore: warm-up respected and z matches a Scala replay") {
    val out = rows("q_ts_anomaly_zscore").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getInt(5)))
    assert(out.nonEmpty)
    assert(out.exists(_._5.isDefined), "no scored rows on this fixture")
    out.groupBy(_._1).foreach { case (u, rs0) =>
      val rs = rs0.sortBy(_._2)
      rs.zipWithIndex.foreach { case ((_, hr, cents, n, zbp, flag), i) =>
        val window = rs.slice(math.max(0, i - 24), i).map(_._3)
        assert(n == window.length, s"user $u hr $hr: window count")
        if (n < 8) assert(zbp.isEmpty, s"user $u hr $hr: scored inside warm-up")
        zbp.foreach { z =>
          val nn = window.length.toDouble
          val s = window.sum.toDouble
          val s2 = window.map(c => c * c).sum.toDouble
          val variance = (nn * s2 - s * s) / (nn * (nn - 1.0))
          val expect = math.floor(
            (nn * cents - s) / (nn * math.sqrt(variance)) * 100 + 0.5).toLong
          assert(z == expect, s"user $u hr $hr: z $z vs $expect")
          assert((flag == 1) == (math.abs(z) >= 300))
        }
        if (zbp.isEmpty) assert(flag == 0)
      }
    }
  }

  test("q_events_nelson_aalen: hazard replay; FH survival bounds KM from above") {
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "unix_micros(CAST(ts AS TIMESTAMP)) AS us")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val perUser = ev.groupBy(_._1).toSeq.map { case (_, es) =>
      val first = es.map(_._3).min
      val conv = es.filter(_._2 == "purchase").map(_._3).minOption
      val tObs = math.floor((conv.getOrElse(es.map(_._3).max) - first) / 3600000000.0).toLong
      (tObs, conv.isDefined)
    }
    val total = perUser.size.toLong
    val byT = perUser.groupBy(_._1)
    val times = byT.filter(_._2.exists(_._2)).keys.toSeq.sorted
    var cum = 0L
    var nBefore = 0L
    val exp = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
    for (t <- byT.keys.toSeq.sorted) {
      val rows0 = byT(t)
      val d = rows0.count(_._2).toLong
      val n = total - nBefore
      if (d > 0) {
        cum += math.floor(d.toDouble * 1e6 / n + 0.5).toLong
        val einv = graft.llm.NeutralMath.expMicroJvm(math.min(29000000L, cum))
        exp += ((t, d, n, cum, math.floor(1e10 / einv.toDouble + 0.5).toLong))
      }
      nBefore += rows0.size
    }
    val got = rows("q_events_nelson_aalen")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == exp.toSeq, s"got ${got.take(4).toSeq}\nexp ${exp.take(4)}")
    assert(times.nonEmpty)
    // classical inequality: exp(-x) >= 1 - x per factor, so the
    // Fleming-Harrington survival bounds KM from ABOVE at every event time
    val km = rows("q_events_survival_km").map(r => (r.getLong(0), r.getLong(3))).toMap
    got.foreach { case (t, _, _, _, fh) =>
      assert(fh + 1 >= km(t), s"t=$t: FH survival $fh below KM ${km(t)}")
    }
    // hazard is non-decreasing
    got.sliding(2).foreach {
      case Array(a, b) => assert(b._4 >= a._4)
      case _ => ()
    }
  }

  test("q_stats_ks_test: binned-CDF replay; D in [0, 1e6] and decision consistent") {
    val vals = Tables.events(spark, sf)
      .where("event_type IN ('click', 'purchase')")
      .selectExpr("event_type", "CAST(FLOOR(value * 100 + 0.5) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def hist(t: String): Array[Long] = {
      val h = Array.fill(64)(0L)
      vals.filter(_._1 == t).foreach { case (_, c) =>
        h(math.min(63L, math.max(0L, c / 800)).toInt) += 1 }
      h
    }
    val (h1, h2) = (hist("click"), hist("purchase"))
    val (n1, n2) = (h1.sum, h2.sum)
    var (c1, c2, dnum) = (0L, 0L, 0L)
    for (b <- 0 until 64) {
      c1 += h1(b); c2 += h2(b)
      dnum = math.max(dnum, math.abs(c1 * n2 - c2 * n1))
    }
    val ks = 1000000L * dnum / (n1 * n2)
    val crit = math.floor(1.358 * math.sqrt((n1 + n2).toDouble / (n1.toDouble * n2)) * 1e6 + 0.5).toLong
    val exp = (n1, n2, ks, crit, if (ks > crit) 1 else 0)

    val got = rows("q_stats_ks_test")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    assert(got.toSeq == Seq(exp), s"got ${got.toSeq}\nexp $exp")
    assert(ks >= 0 && ks <= 1000000L)
  }

  test("q_stats_mannwhitney: binned rank-sum replay; U symmetry and decision consistency") {
    val vals = Tables.events(spark, sf)
      .where("event_type IN ('click', 'purchase')")
      .selectExpr("event_type", "CAST(FLOOR(value * 100 + 0.5) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def hist(t: String): Array[Long] = {
      val h = Array.fill(64)(0L)
      vals.filter(_._1 == t).foreach { case (_, c) =>
        h(math.min(63L, math.max(0L, c / 800)).toInt) += 1 }
      h
    }
    val (h1, h2) = (hist("click"), hist("purchase"))
    val (n1, n2) = (h1.sum, h2.sum)
    val n = n1 + n2
    var (cum2, u2, ties) = (0L, 0L, 0L)
    for (b <- 0 until 64) {
      cum2 += h2(b)
      u2 += h1(b) * (2 * cum2 - h2(b))
      val t = h1(b) + h2(b)
      ties += t * t * t - t
    }
    val a2 = u2 - n1 * n2
    val s = math.max(1L, (n + 1) * n * (n - 1) - ties)
    val z = a2.toDouble / (2.0 * math.sqrt(
      n1.toDouble * n2.toDouble * s.toDouble / (12.0 * n.toDouble * (n - 1).toDouble)))
    val cles = u2.toDouble / (2.0 * n1.toDouble * n2.toDouble)
    val exp = (n1, n2, u2, ties, z, cles, if (math.abs(z) > 1.96) 1 else 0)

    val got = rows("q_stats_mannwhitney").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getInt(6)))
    assert(got.toSeq == Seq(exp), s"got ${got.toSeq}\nexp $exp")
    // U symmetry: 2·U1 + 2·U2 = 2·n1·n2, so U1 within [0, n1·n2]
    assert(u2 >= 0 && u2 <= 2 * n1 * n2)
    assert(cles >= 0.0 && cles <= 1.0)
  }

  test("q_events_rfm: exact quintile replay; segments partition customers") {
    val orders = Tables.orders(spark, sf)
      .selectExpr("o_custkey", "CAST(o_orderdate AS DATE)",
        "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getAs[java.sql.Date](1).toLocalDate, r.getLong(2)))
    val anchor = orders.map(_._2).maxBy(_.toEpochDay)
    val base = orders.groupBy(_._1).toSeq.map { case (ck, os) =>
      val lastD = os.map(_._2).maxBy(_.toEpochDay)
      (ck, anchor.toEpochDay - lastD.toEpochDay, os.size.toLong, os.map(_._3).sum)
    }
    val nCust = base.size.toLong
    def quintile(ranked: Seq[Long]): Map[Long, Int] =
      ranked.zipWithIndex.map { case (ck, i) => ck -> ((i.toLong * 5) / nCust + 1).toInt }.toMap
    val rq = quintile(base.sortBy(b => (b._2, b._1)).map(_._1))
    val fq = quintile(base.sortBy(b => (b._3, b._1)).map(_._1))
    val mq = quintile(base.sortBy(b => (b._4, b._1)).map(_._1))
    val exp = base.groupBy(b => (6 - rq(b._1)) * 100 + fq(b._1) * 10 + mq(b._1))
      .toSeq.map { case (seg, cs) =>
        val cents = cs.map(_._4).sum
        (seg, cs.size.toLong, cents, cents.toDouble / cs.size)
      }.sortBy(_._1)

    val got = rows("q_events_rfm").map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == exp, s"got ${got.take(5).toSeq}\nexp ${exp.take(5)}")
    // segments partition the customer base; scores confined to 1..5
    assert(got.map(_._2).sum == nCust)
    got.foreach { case (seg, _, _, _) =>
      val (r5, f5, m5) = (seg / 100, seg / 10 % 10, seg % 10)
      assert(r5 >= 1 && r5 <= 5 && f5 >= 1 && f5 <= 5 && m5 >= 1 && m5 <= 5, s"segment $seg")
    }
  }

  test("q_stats_gini: exact rank-weighted replay; Lorenz curve convex and bounded") {
    val spend = Tables.orders(spark, sf)
      .selectExpr("o_custkey", "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).toSeq.map { case (ck, os) => (ck, os.map(_._2).sum) }
    val n = spend.size.toLong
    val tot = spend.map(_._2).sum
    val ranked = spend.sortBy { case (ck, c) => (c, ck) }
    val s1 = ranked.zipWithIndex.map { case ((_, c), i) => (i + 1L) * c }.sum
    val gnum = 2 * s1 - (n + 1) * tot
    val cum = ranked.scanLeft(0L)(_ + _._2).tail
    val exp = (1 to 10).map { d =>
      val rd = n * d / 10
      (d, rd, cum(rd.toInt - 1), cum(rd.toInt - 1).toDouble / tot.toDouble,
        gnum, n, tot, gnum.toDouble / (n.toDouble * tot.toDouble))
    }

    val got = rows("q_stats_gini").map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
      r.getDouble(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7)))
    assert(got.toSeq == exp, s"got ${got.take(3).toSeq}\nexp ${exp.take(3)}")
    // Lorenz: shares non-decreasing, convex (increments grow), ends at 1
    val sh = got.map(_._4)
    sh.sliding(2).foreach { case Array(a, b) => assert(b >= a); case _ => () }
    assert(sh.last == 1.0)
    val g = got.head._8
    assert(g >= 0.0 && g < 1.0, s"gini $g out of [0,1)")
  }

  test("q_events_cohort_ltv: revenue triangle replay; LTV accumulates, cohorts partition") {
    val orders = Tables.orders(spark, sf)
      .selectExpr("o_custkey", "YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1",
        "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2)))
    val firstM = orders.groupBy(_._1).map { case (ck, os) => ck -> os.map(_._2).min }
    val cohortN = firstM.groupBy(_._2).map { case (cm, m) => cm -> m.size.toLong }
    val rev = orders.groupBy(o => (firstM(o._1), o._2 - firstM(o._1)))
      .map { case (k, os) => k -> os.map(_._3).sum }
    val exp = rev.keys.toSeq.sorted.map { case (cm, age) =>
      val cumC = rev.filter { case ((c, a), _) => c == cm && a <= age }.values.sum
      ((cm / 12 * 100 + cm % 12 + 1).toInt, age.toInt, cohortN(cm), rev((cm, age)),
        cumC, cumC.toDouble / cohortN(cm).toDouble)
    }

    val got = rows("q_events_cohort_ltv").map(r => (r.getInt(0), r.getInt(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == exp, s"got ${got.take(3).toSeq}\nexp ${exp.take(3)}")
    // cohort sizes partition the customer base; total revenue conserved
    assert(cohortN.values.sum == firstM.size.toLong)
    assert(got.map(_._4).sum == orders.map(_._3).sum)
    got.groupBy(_._1).values.foreach { rs =>
      rs.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => assert(b._5 >= a._5, s"cohort ${a._1}: cum revenue dropped")
        case _ => ()
      }
    }
  }

  test("q_events_survival_km: non-increasing curve that matches a Scala KM replay") {
    val out = rows("q_events_survival_km").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    // survival is a product of factors in (0, 1]: strictly non-increasing
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._1 < b._1)
        assert(b._4 <= a._4, "survival must not increase")
        assert(b._3 <= a._3 - a._2, "at-risk must shrink by at least the converters")
      case _ => ()
    }
    // independent replay in Scala from the raw events
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "unix_micros(CAST(ts AS TIMESTAMP)) AS us")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // .toSeq BEFORE mapping to pairs: mapping the Map directly would
    // rebuild a Map keyed on tObs and silently collapse users sharing an
    // observation time
    val perUser = ev.groupBy(_._1).toSeq.map { case (_, es) =>
      val first = es.map(_._3).min
      val conv = es.filter(_._2 == "purchase").map(_._3).minOption
      val tObs = math.floor((conv.getOrElse(es.map(_._3).max) - first) / 3600000000.0).toLong
      (tObs, conv.isDefined)
    }
    val total = perUser.size.toLong
    val byT = perUser.groupBy(_._1)
    val times = out.map(_._1)
    var cumLog = 0L
    var extinct = false
    times.foreach { t =>
      val d = byT.get(t).map(_.count(_._2).toLong).getOrElse(0L)
      val nBefore = perUser.count(_._1 < t).toLong
      val n = total - nBefore
      if (d == n) extinct = true
      else cumLog += math.floor(math.log(1.0 - d.toDouble / n) * 1000000).toLong
      val sBp =
        if (extinct) 0L
        else math.floor(math.exp(cumLog / 1000000.0) * 10000 + 0.5).toLong
      val row = out.find(_._1 == t).get
      assert(row._2 == d && row._3 == n && row._4 == sBp, s"t=$t: $row vs ($d, $n, $sBp)")
    }
    // the terminal d = n row must be PRESENT with surv 0 (review-round
    // catch: dropping it undercounts final conversions) — on this fixture
    // every user converts, so the curve must reach zero
    if (perUser.forall(_._2)) {
      assert(out.last._4 == 0L, "curve must reach 0 when all users convert")
      assert(out.map(_._2).sum == total, "every conversion must appear on the curve")
    }
  }

  test("q_events_retention: week-0 is 10000 bp and no cell exceeds its cohort") {
    val out = rows("q_events_retention").map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (cwk, cells) =>
      val base = cells.find(_._2 == 0).getOrElse(fail(s"cohort $cwk missing week 0"))
      assert(base._4 == 10000L)
      cells.foreach { c =>
        assert(c._3 <= base._3, s"cohort $cwk offset ${c._2} exceeds cohort size")
        assert(c._4 <= 10000L)
      }
    }
    // cohort sums reconcile with the distinct-user universe
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(out.filter(_._2 == 0).map(_._3).sum == users)
  }

  test("q_events_k_anonymity: every released cell holds >= 5 rows; row mass is conserved") {
    val s = graft.TestSpark.spark.newSession()
    val out = graft.SparkEntry.queries("q_events_k_anonymity")(s, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(out.nonEmpty && out.forall(r => r._2 >= 1 && r._2 <= 3))
    // total released+suppressed rows == total events (nothing dropped)
    val total = graft.queries.Tables.events(s, sf).count()
    assert(out.map(_._3).sum == total, s"${out.map(_._3).sum} != $total events")
    // independent k-guarantee replay: re-derive the level-1 and level-2
    // cells and check every cell the operator releases meets K = 5
    val cells = s.sql(
      """WITH e AS (SELECT event_type,
        |                 CAST(CAST(FLOOR(unix_micros(CAST(ts AS TIMESTAMP)) / 3600000000) AS BIGINT) % 24 AS INT) AS hh,
        |                 CAST(FLOOR(value) AS BIGINT) DIV 10 AS v10,
        |                 CAST(FLOOR(value) AS BIGINT) DIV 100 AS v100
        |          FROM events),
        |g1 AS (SELECT event_type, hh, v10, COUNT(*) AS n FROM e GROUP BY 1, 2, 3),
        |u AS (SELECT e.* FROM e JOIN g1 USING (event_type, hh, v10) WHERE g1.n < 5),
        |g2 AS (SELECT event_type, hh, v100, COUNT(*) AS n FROM u GROUP BY 1, 2, 3)
        |SELECT 1 AS lvl, n FROM g1 WHERE n >= 5
        |UNION ALL SELECT 2, n FROM g2 WHERE n >= 5""".stripMargin).collect()
    assert(cells.forall(_.getLong(1) >= 5))
    // the operator's released row mass per level equals the cell replay's
    val byLvl = out.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val replay = cells.groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(1)).sum).toMap
    assert(byLvl.getOrElse(1, 0L) == replay.getOrElse(1, 0L), "level-1 mass mismatch")
    assert(byLvl.getOrElse(2, 0L) == replay.getOrElse(2, 0L), "level-2 mass mismatch")
  }

  test("q_mix_unimax: rarer sources get MORE epochs (the fairness property vs proportional)") {
    val out = rows("q_mix_unimax").map(r => (r.getLong(1), r.getLong(4)))
    out.sortBy(_._1).sliding(2).foreach {
      case Array((nSmall, epSmall), (nBig, epBig)) if nSmall < nBig =>
        assert(epSmall >= epBig,
          s"source with $nSmall tokens got $epSmall bp but larger $nBig got $epBig")
      case _ => ()
    }
  }

  test("q_stats_column_profile: stats equal direct fixture aggregates (pk has ndv = rows)") {
    val out = rows("q_stats_column_profile").map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5), r.getLong(6))).toMap
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val n = o.count()
    // primary key: ndv == rows, no nulls, min/max are the padded keys
    val (okRows, okNull, okNdv, okMin, okMax, okLen) = out("o_orderkey")
    assert(okRows == n && okNull == 0L && okNdv == n)
    val keys = o.selectExpr("min(o_orderkey)", "max(o_orderkey)").head()
    assert(okMin == f"${keys.getLong(0)}%012d" && okMax == f"${keys.getLong(1)}%012d")
    assert(okLen == 1200L, "zero-padded key width must be exactly 12.00 chars")
    // low-cardinality string: ndv equals the direct distinct count
    val prioNdv = o.selectExpr("count(distinct o_orderpriority)").head().getLong(0)
    assert(out("o_orderpriority")._3 == prioNdv)
    assert(out.keySet == Set("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
  }

  test("q_layout_clustering_depth: shipdate-clustered files don't overlap; ingest-order files stack") {
    val out = rows("q_layout_clustering_depth").map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(4), r.getLong(5))).toMap
    val (clFiles, clMax, clAvg) = out("clustered")
    val (inFiles, inMax, inAvg) = out("ingest")
    // day DIV 30 buckets are disjoint by construction: depth exactly 1
    assert(clMax == 1L && clAvg == 100L,
      s"clustered layout must be overlap-free, got max=$clMax avg=$clAvg")
    // ingest-order files each span nearly the whole date range: almost
    // every file overlaps every other
    assert(inFiles > 1L)
    assert(inMax >= inFiles / 2,
      s"ingest layout should stack (max depth $inMax vs $inFiles files)")
    // ingest files all span ~the whole date range, so mean start depth is
    // ~(F+1)/2 — well above the clustered layout's flat 1.00
    assert(inAvg >= 3L * clAvg, "the audit must separate the two layouts clearly")
  }

  test("q_events_seq_trigrams: counts replay from per-user ordered sliding windows") {
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "unix_micros(CAST(ts AS TIMESTAMP))", "event_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val tri = ev.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      es.sortBy(e => (e._3, e._4)).map(_._2).sliding(3).filter(_.length == 3)
        .map(s => (u, (s(0), s(1), s(2)))).toSeq
    }
    val exp = tri.groupBy(_._2).map { case (t, xs) =>
      (t._1, t._2, t._3, xs.length.toLong, xs.map(_._1).distinct.length.toLong)
    }.toSeq.sortBy { case (a, b, c, n, _) => (-n, a, b, c) }.take(15)
    val got = rows("q_events_seq_trigrams")
      .map(r => (r.getString(1), r.getString(2), r.getString(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == exp)
    // support can never exceed occurrences
    got.foreach { case (_, _, _, n, u) => assert(u <= n && u > 0) }
  }

  test("q_events_lateness_audit: lateness replays per shard; zero at the delay-spread bound") {
    val ev = Tables.events(spark, sf)
      .selectExpr("event_id", "unix_micros(CAST(ts AS TIMESTAMP))")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def jitter(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(3).map(b => f"$b%02x").mkString.take(5), 16) % 86400
    }
    val exp = Seq(0L, 21600L, 86400L).map { w =>
      var late = 0L
      ev.groupBy(_._1 % 8).values.foreach { es =>
        var wm = Long.MinValue
        es.map { case (id, us) => (us + jitter(id) * 1000000L, id, us) }
          .sortBy(e => (e._1, e._2)).foreach { case (_, _, us) =>
            if (wm != Long.MinValue && us < wm - w * 1000000L) late += 1
            wm = math.max(wm, us)
          }
      }
      (w, ev.length.toLong, late, late * 10000 / ev.length)
    }
    val got = rows("q_events_lateness_audit")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == exp)
    // widening the allowed delay can only reduce late arrivals, the
    // audit must be non-vacuous at W=0, and at the 86400 s delay spread
    // the inversion bound makes lateness provably zero
    val lates = got.map(_._3)
    assert(lates.reverse.sorted.toSeq == lates.reverse.toSeq, s"not monotone: $lates")
    assert(lates.head > 0)
    assert(lates.last == 0L)
  }

  test("q_dim_pit_join: one row per fact; status matches an independent SCD replay") {
    val ords = Tables.orders(spark, sf)
      .selectExpr("o_orderkey", "o_custkey",
        "CAST(o_orderdate AS DATE)", "o_orderstatus")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.sql.Date](2).toLocalDate, r.getString(3)))
    // Replay the SCD build: per key, per ts keep the max-seq change, then
    // collapse consecutive equal attrs into validity intervals.
    val scd = ords.groupBy(_._2).map { case (key, os) =>
      val perTs = os.groupBy(_._3).toSeq
        .map { case (ts, xs) => (ts, xs.maxBy(_._1)._4) }
        .sortBy(_._1.toString)
      val collapsed = perTs.foldLeft(List.empty[(java.time.LocalDate, String)]) {
        case (acc, (ts, a)) =>
          if (acc.nonEmpty && acc.head._2 == a) acc else (ts, a) :: acc
      }.reverse
      key -> collapsed.zipAll(collapsed.drop(1).map(x => Some(x._1)), null, None)
        .collect { case ((from, a), to) =>
          (from, a, to.asInstanceOf[Option[java.time.LocalDate]]) }
    }
    val facts = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "l_linenumber", "CAST(l_shipdate AS DATE)")
      .where("l_orderkey % 37 = 0")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        r.getAs[java.sql.Date](2).toLocalDate))
    val got = rows("q_dim_pit_join")
    assert(got.length == facts.length, "PIT join must keep exactly one row per fact")
    val okey2cust = ords.map(o => o._1 -> o._2).toMap
    got.foreach { r =>
      val (okey, line) = (r.getLong(0), r.getInt(1).toLong)
      val sd = r.getAs[java.sql.Date](3).toLocalDate
      val key = okey2cust(okey)
      assert(r.getLong(2) == key)
      val expect = scd(key).find { case (from, _, to) =>
        !sd.isBefore(from) && to.forall(t => sd.isBefore(t))
      }
      assert(Option(r.getString(4)) == expect.map(_._2),
        s"fact ($okey,$line) at $sd: wrong AS-OF version")
    }
    // the fixture ships some lineitems BEFORE their order date, so
    // pre-history NULLs are legitimate — but they must be the exception,
    // and every NULL must be a genuinely pre-history fact (the per-row
    // equality above already pinned that); the join must resolve the rest
    val resolved = got.count(_.getString(4) != null)
    assert(resolved > got.length / 2, s"only $resolved/${got.length} facts resolved")
  }

  test("q_ts_seasonal_decompose: full Scala replay; profile averages bracketed by extremes") {
    val hrs = Tables.events(spark, sf)
      .selectExpr("CAST(FLOOR(unix_micros(CAST(ts AS TIMESTAMP)) / 3600000000) AS BIGINT)")
      .collect().map(_.getLong(0))
    val counts = hrs.groupBy(identity).map { case (h, xs) => h -> xs.length.toLong }
    val (mn, mx) = (hrs.min, hrs.max)
    val dense = (mn to mx).map(h => counts.getOrElse(h, 0L)).toArray
    val det = scala.collection.mutable.Map.empty[Long, List[Long]]
    for (i <- dense.indices if i >= 11 && i + 12 < dense.length) {
      val s24 = (i - 11 to i + 12).map(dense).sum
      det((mn + i) % 24) = (dense(i) * 24 - s24) :: det.getOrElse((mn + i) % 24, Nil)
    }
    val exp = det.toSeq.map { case (hod, ds) =>
      val n = ds.length.toLong
      (hod, n, Math.floorDiv(ds.sum + n * 2000000000L, n) - 2000000000L, ds.min, ds.max)
    }.sortBy(_._1)
    val got = rows("q_ts_seasonal_decompose")
      .map(r => (r.getInt(0).toLong, r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == exp)
    assert(got.length == 24, "every hour-of-day cell must be populated")
    // a seasonal average can never escape its cell's remainder extremes
    got.foreach { case (_, _, s, lo, hi) => assert(lo <= s && s <= hi) }
    // detrending by a 24-bin MA makes the 24 seasonal offsets sum to ~0:
    // each window sum appears once per hod, so the global mean of det24 is
    // exactly 0 over complete cycles — allow the floor-div slack per cell
    val total = got.map(s => s._3 * s._2).sum
    assert(math.abs(total) <= 24L * got.map(_._2).max)
  }

  test("q_stats_kmv_intersect: exact overlaps replay; estimates clamp and bound") {
    val dv = Tables.events(spark, sf)
      .selectExpr("event_type", "user_id").distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byType = dv.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }
    val types = byType.keys.toSeq.sorted
    val expPairs = for {
      i <- types.indices; j <- i + 1 until types.size
    } yield (types(i), types(j),
      (byType(types(i)) & byType(types(j))).size.toLong)
    val got = rows("q_stats_kmv_intersect")
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.map(g => (g._1, g._2, g._3)).toSeq == expPairs)

    // full estimate replay (round-8 advice): the per-type and pair-union
    // KMV estimates must reproduce from an independent JVM sketch build
    // bit-for-bit — this confirms the inclusion-exclusion FORMULA, not
    // just cross-engine agreement
    def h48(v: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(v.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(6).map(b => f"$b%02x").mkString, 16)
    }
    val sketch = dv.groupBy(_._1).map { case (t, xs) =>
      t -> xs.map(x => h48(x._2)).toSeq.sorted.take(128)
    }
    def estOf(t: String): Long = {
      val nd = byType(t).size.toLong
      if (nd < 128) nd else 127L * 281474976710656L / sketch(t).apply(127)
    }
    val expEst = got.map { case (ta, tb, exact, _, _) =>
      val mins = (sketch(ta) ++ sketch(tb)).distinct.sorted
      val eu = if (mins.size < 128) mins.size.toLong
               else 127L * 281474976710656L / mins(127)
      math.max(estOf(ta) + estOf(tb) - eu, 0L)
    }
    assert(got.map(_._4).toSeq == expEst.toSeq,
      "KMV inclusion-exclusion estimates diverge from the JVM replay")

    got.foreach { case (ta, tb, exact, est, errBp) =>
      assert(est >= 0, s"($ta,$tb): clamped estimate must be non-negative")
      // k=128 KMV: each of the three estimates carries ~1/sqrt(k) relative
      // error; inclusion-exclusion can triple it. 50% is the loose alarm
      // bound — it catches sign errors and unit mistakes, not noise.
      assert(errBp <= 5000, s"($ta,$tb): err_bp=$errBp vs exact=$exact est=$est")
      assert(errBp == math.abs(est - exact) * 10000 / math.max(exact, 1L))
    }
  }

  test("q_events_next_pred: train/eval replay; no leakage across the midpoint cut") {
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "event_type",
        "unix_micros(CAST(ts AS TIMESTAMP))")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val cut = (ev.map(_._4).min + ev.map(_._4).max) / 2
    val trans = ev.groupBy(_._1).values.toSeq.flatMap { es =>
      es.sortBy(e => (e._4, e._2)).sliding(2).filter(_.length == 2)
        .map(p => (p(0)._3, p(1)._3, p(0)._4)).toSeq
    }
    val model = trans.filter(_._3 < cut).groupBy(_._1).map { case (cur, xs) =>
      cur -> xs.groupBy(_._2).map { case (n, ys) => (n, ys.length) }
        .toSeq.sortBy { case (n, c) => (-c, n) }.head._1
    }
    val test = trans.filter(_._3 >= cut).filter(t => model.contains(t._1))
    val exp = test.groupBy(_._1).map { case (cur, xs) =>
      val hit = xs.count(_._2 == model(cur)).toLong
      (cur, model(cur), xs.length.toLong, hit, hit * 10000 / xs.length)
    }.toSeq.sortBy(_._1)
    val got = rows("q_events_next_pred")
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == exp)
    // the eval must be non-vacuous and accuracy must beat the uniform
    // floor for at least one type (the model learned SOMETHING)
    assert(got.map(_._3).sum > 0)
    assert(got.exists(_._5 > 10000 / 5))
  }

  test("q_stats_quantile_merge: exact quantiles replay; merged rank error within the summary bound") {
    val vs = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey * 16 + l_linenumber",
        "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sorted = vs.sortBy(v => (v._2, v._1)).map(_._2)
    val n = sorted.length.toLong
    val got = rows("q_stats_quantile_merge")
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.map(_._1).toSeq == Seq(50, 90, 99))
    got.foreach { case (q, nt, target, est, exact, estRank, errBp) =>
      assert(nt == n)
      assert(target == (n * q + 99) / 100)
      assert(exact == sorted((target - 1).toInt), s"P$q exact mismatch")
      // summary guarantee: each of the 16 shards can misplace at most one
      // 64-row block around the cut, so the merged estimate's true rank
      // sits within 16·64 rows of the target — distribution-free
      assert(math.abs(estRank - target) <= 16L * 64L,
        s"P$q: est rank $estRank vs target $target breaches the summary bound")
      assert(errBp == math.abs(estRank - target) * 10000 / n)
      // the estimate is a real data value no smaller than the exact cut's
      // predecessor block allows
      assert(sorted.contains(est))
    }
  }

  private def denseHourly(): (Long, Array[Long]) = {
    val hrs = Tables.events(spark, sf)
      .selectExpr("CAST(FLOOR(unix_micros(CAST(ts AS TIMESTAMP)) / 3600000000) AS BIGINT)")
      .collect().map(_.getLong(0))
    val counts = hrs.groupBy(identity).map { case (h, xs) => h -> xs.length.toLong }
    val (mn, mx) = (hrs.min, hrs.max)
    (mn, (mn to mx).map(h => counts.getOrElse(h, 0L)).toArray)
  }

  test("q_ts_autocorr: Pearson replay from exact moments; diurnal lag beats hourly decay") {
    val (_, dense) = denseHourly()
    def acf(lag: Int): (Long, Double) = {
      val pairs = dense.dropRight(lag).zip(dense.drop(lag))
      val np = pairs.length.toLong
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val (cov, vx, vy) = ((np * sxy - sx * sy).toDouble,
        (np * sxx - sx * sx).toDouble, (np * syy - sy * sy).toDouble)
      val r = if (vx > 0 && vy > 0) cov / math.sqrt(vx * vy) else 0.0
      (np, r)
    }
    val got = rows("q_ts_autocorr")
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == Seq(1, 24, 168))
    got.foreach { case (lag, np, r) =>
      val (en, er) = acf(lag)
      assert(np == en, s"lag $lag: pair count")
      assert(math.abs(r - er) <= 1e-9, s"lag $lag: acf $r != $er")
      assert(r > -1.0 - 1e-9 && r < 1.0 + 1e-9)
    }
  }

  test("q_stats_benford: first-digit replay; counts cover the table") {
    val cents = Tables.orders(spark, sf)
      .where("o_totalprice > 0")
      .selectExpr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)")
      .collect().map(_.getLong(0))
    val obs = cents.map(_.toString.head.asDigit).groupBy(identity)
      .map { case (d, g) => d -> g.size.toLong }
    val n = cents.length.toLong
    val p = Map(1 -> 301029L, 2 -> 176091L, 3 -> 124938L, 4 -> 96910L,
      5 -> 79181L, 6 -> 66946L, 7 -> 57991L, 8 -> 51152L, 9 -> 45757L)
    val exp = (1 to 9).map { d =>
      val o = obs.getOrElse(d, 0L)
      val em = math.max(1L, n * p(d) / 1000)
      val r = o * 1000 - em
      (d, o, em, math.floor(r.toDouble * r.toDouble / (em.toDouble * 1e3) * 1e6 + 0.5).toLong)
    }
    val chi2 = exp.map(_._4).sum

    val got = rows("q_stats_benford")
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == exp.map(e => (e._1, e._2, e._3, chi2)), s"got ${got.toSeq}")
    // audit sanity: counts cover the table, and the synthetic fixture
    // deviates from the law (that deviation is the audit's signal)
    assert(exp.map(_._2).sum == n)
    assert(chi2 > 0)
  }

  test("q_stats_bootstrap_ci: poissonized replica replay; CI brackets the mean") {
    val cents = Tables.orders(spark, sf)
      .selectExpr("o_orderkey",
        "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val th = Seq(6171992L, 12343985L, 15429982L, 16458647L, 16715813L, 16767247L)
    def u24(key: Long, b: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${key}_$b".getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(3).map(x => f"$x%02x").mkString, 16)
    }
    val means = (0 until 32).map { b =>
      var s = 0L; var n = 0L
      for ((k, c) <- cents) {
        val u = u24(k, b)
        val wt = th.indexWhere(u < _) match { case -1 => 6L; case i => i.toLong }
        s += wt * c; n += wt
      }
      (b, s / math.max(1L, n))
    }
    val sorted = means.sortBy { case (b, m) => (m, b) }.map(_._2)
    val (lo, hi) = (sorted(1), sorted(30))
    val trueMean = cents.map(_._2).sum / cents.length

    val got = rows("q_stats_bootstrap_ci")
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq ==
      Seq((32, cents.length.toLong, trueMean, lo, hi)), s"got ${got.toSeq}")
    // the interval is real: nondegenerate and bracketing the point estimate
    assert(lo < hi, "degenerate CI")
    assert(lo <= trueMean && trueMean <= hi,
      s"CI [$lo, $hi] does not bracket the mean $trueMean")
  }

  test("q_events_dp_release: Laplace inverse-CDF replay through the JVM kernel") {
    val counts = Tables.events(spark, sf)
      .groupBy("event_type").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val m = 16777216L
    val exp = counts.map { case (et, n) =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(et.getBytes("UTF-8"))
      val h = java.lang.Long.parseLong(md.take(3).map(b => f"$b%02x").mkString, 16)
      val kk = 2 * h + 1
      val sgn = if (kk < m) -1L else 1L
      val dev = m - math.abs(kk - m)
      val noise = sgn * graft.llm.NeutralMath.lnScaledJvm(m, dev, 1e6)
      val released = math.max(0L,
        math.floor((n.toDouble * 1e6 + noise.toDouble) / 1e6 + 0.5).toLong)
      (et, n, noise, released, math.abs(noise))
    }
    val got = rows("q_events_dp_release")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == exp.toSeq, s"got ${got.toSeq}\nexp ${exp.toSeq}")
    // the mechanism does something: at least one type is perturbed, and
    // the released counts stay within a plausible Laplace band (b=1 →
    // |noise| < 20 with overwhelming margin; here it is deterministic)
    assert(exp.exists(r => r._4 != r._2), "no count perturbed")
    assert(exp.forall(r => math.abs(r._4 - r._2) <= 20),
      "noise magnitude out of the Laplace(1) band")
  }

  test("q_ts_theil_sen: pairwise-slope replay; estimator sits inside the slope distribution") {
    val (_, dense) = denseHourly()
    val slopes = (for {
      i <- dense.indices; j <- (i + 1) until dense.length
    } yield math.floor((dense(j) - dense(i)).toDouble * 1e6 / (j - i) + 0.5).toLong).sorted
    val np = slopes.length.toLong
    val lo = slopes(((np + 1) / 2 - 1).toInt)
    val hi = slopes((np / 2).toInt)
    val mid = math.floor((lo.toDouble + hi.toDouble) / 2.0 + 0.5).toLong

    val got = rows("q_ts_theil_sen")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((np, lo, hi, mid)), s"got ${got.toSeq}\nexp ${(np, lo, hi, mid)}")
    // robust-median sanity: the two middle order statistics bracket the
    // estimator and the slope distribution is non-degenerate
    assert(lo <= mid && mid <= hi)
    assert(slopes.head < slopes.last, "all pairwise slopes identical — flat fixture")
  }

  test("q_events_next_pred2: JVM replay of both models and the backoff; acc within [0, 10000]") {
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "event_type",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val cut = (ev.map(_._4).min + ev.map(_._4).max) / 2
    // per-user chronological chains with (prv, cur, nxt)
    val trips = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val s = es.sortBy(e => (e._4, e._2))
      s.indices.map { i =>
        val prv = if (i > 0) Some(s(i - 1)._3) else None
        val nxt = if (i < s.length - 1) Some(s(i + 1)._3) else None
        (prv, s(i)._3, nxt, s(i)._4)
      }
    }
    def argmax[K](m: Map[K, Map[String, Int]]): Map[K, String] =
      m.map { case (k, cs) => k -> cs.toSeq.minBy { case (n, c) => (-c, n) }._1 }
    val md2 = argmax(trips.collect {
      case (Some(p), c, Some(n), us) if us < cut => ((p, c), n)
    }.groupBy(_._1).map { case (k, xs) =>
      k -> xs.groupBy(_._2).map { case (n, g) => n -> g.size } })
    val md1 = argmax(trips.collect {
      case (_, c, Some(n), us) if us < cut => (c, n)
    }.groupBy(_._1).map { case (k, xs) =>
      k -> xs.groupBy(_._2).map { case (n, g) => n -> g.size } })
    val evalRows = trips.collect { case (p, c, Some(n), us) if us >= cut => (p, c, n) }
    val exp = evalRows.groupBy(_._2).toSeq.sortBy(_._1).map { case (cur, rows) =>
      val preds = rows.map { case (p, c, n) =>
        val m2 = p.flatMap(pp => md2.get((pp, c)))
        (m2.getOrElse(md1(c)), m2.isEmpty, n)
      }
      val (ne, nh, nb) = (rows.size.toLong,
        preds.count(x => x._1 == x._3).toLong, preds.count(_._2).toLong)
      (cur, ne, nh, nb, nh * 10000 / ne, nb * 10000 / ne)
    }
    val got = rows("q_events_next_pred2").map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == exp, s"got ${got.toSeq}\nexp $exp")
    got.foreach { case (c, _, _, _, acc, bo) =>
      assert(acc >= 0 && acc <= 10000 && bo >= 0 && bo <= 10000, c) }
  }

  test("q_events_srm: exact arm recount; balanced hash assignment does not flag") {
    val users = Tables.events(spark, sf)
      .select("user_id").distinct().collect().map(_.getLong(0))
    val md = java.security.MessageDigest.getInstance("MD5")
    def arm(u: Long): Long = {
      val hex = md.digest(u.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 6), 16) % 2
    }
    val n0 = users.count(arm(_) == 0L).toLong
    val n1 = users.length - n0
    val chi = (n0 - n1).toDouble * (n0 - n1) / (n0 + n1)
    val got = rows("q_events_srm").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).head
    assert(got == ((n0, n1, math.floor(chi * 100 + 0.5).toLong,
      if (chi > 3.841) 1 else 0)))
    // md5 parity over the fixture population is balanced — no mismatch
    assert(got._4 == 0, s"SRM flagged on unbiased assignment: $got")
  }

  test("q_events_cuped: JVM replay of moments, theta and adjusted means; CUPED never inflates variance") {
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
        "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents")
      .where("event_type = 'purchase'")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cut = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val md = java.security.MessageDigest.getInstance("MD5")
    def arm(u: Long): Long = {
      val hex = md.digest(u.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 6), 16) % 2
    }
    val perUser = ev.groupBy(_._1).map { case (u, es) =>
      (u, es.filter(_._2 < cut).map(_._3).sum, es.filter(_._2 >= cut).map(_._3).sum)
    }.toSeq
    case class M(n: Long, sx: Long, sy: Long, sxx: Long, syy: Long, sxy: Long)
    def mom(rows: Seq[(Long, Long, Long)]) = M(rows.size.toLong,
      rows.map(_._2).sum, rows.map(_._3).sum,
      rows.map(r => r._2 * r._2).sum, rows.map(r => r._3 * r._3).sum,
      rows.map(r => r._2 * r._3).sum)
    val byArm = perUser.groupBy(r => arm(r._1)).map { case (a, rs) => a -> mom(rs) }
    val g = mom(perUser)
    val theta = if (g.n * g.sxx - g.sx * g.sx > 0)
      (g.n * g.sxy - g.sx * g.sy).toDouble / (g.n * g.sxx - g.sx * g.sx).toDouble
    else 0.0
    val mx = g.sx.toDouble / g.n
    val exp = byArm.toSeq.sortBy(_._1).map { case (a, m) =>
      val v = (m.n * m.syy - m.sy * m.sy).toDouble
      val c = (m.n * m.sxy - m.sx * m.sy).toDouble
      val xv = (m.n * m.sxx - m.sx * m.sx).toDouble
      (a.toInt, m.n, m.sy,
        math.floor(m.sy.toDouble / m.n + 0.5).toLong,
        math.floor(m.sy.toDouble / m.n - theta * (m.sx.toDouble / m.n - mx) + 0.5).toLong,
        if (v > 0) math.floor((1.0 - (v - 2.0 * theta * c + theta * theta * xv) / v) * 10000 + 0.5).toLong
        else -1L)
    }
    val got = rows("q_events_cuped").map(r => (r.getInt(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4),
      if (r.isNullAt(5)) -1L else r.getLong(5)))
    assert(got.toSeq == exp, s"got ${got.toSeq}\nexp $exp")
    // POOLED reduction with pooled theta is exactly r²(X,Y) >= 0 — the
    // mathematical guarantee CUPED gives (per-arm values may dip slightly
    // negative when the covariate is weak, as on this iid-value fixture);
    // also sanity-bound every displayed ratio
    val gv = (g.n * g.syy - g.sy * g.sy).toDouble
    val gc = (g.n * g.sxy - g.sx * g.sy).toDouble
    val gx = (g.n * g.sxx - g.sx * g.sx).toDouble
    if (gv > 0 && gx > 0)
      assert(1.0 - (gv - 2 * theta * gc + theta * theta * gx) / gv >= -1e-12,
        "pooled CUPED variance must never inflate")
    got.foreach { case (a, _, _, _, _, bp) =>
      assert(bp == -1L || math.abs(bp) <= 10000, s"arm $a: ratio $bp out of range") }
  }

  test("q_ts_ewma: dyadic smoother replay; residuals are exact scaled integers") {
    val (mn, dense) = denseHourly()
    // lsc(t) = sum_{i=0..19} n(t-i) * 2^(19-i), defined where all 20 taps exist
    val lsc = dense.indices.collect { case t if t >= 19 =>
      (mn + t, (0 to 19).map(i => dense(t - i) * (1L << (19 - i))).sum)
    }.toMap
    val exp = dense.indices.collect {
      case t if lsc.contains(mn + t - 1) =>
        (mn + t, dense(t), lsc(mn + t - 1),
          dense(t) * 1048576L - lsc(mn + t - 1))
    }.sortBy { case (hr, _, _, r) => (-math.abs(r), hr) }.take(20)
      .zipWithIndex.map { case ((hr, n, l, r), i) => (i + 1, hr, n, l, r) }
    val got = rows("q_ts_ewma")
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == exp.toSeq, s"got ${got.toSeq.take(3)}...\nexp ${exp.take(3)}...")
    // smoother sanity: the EWMA level sits inside the 20-tap min/max hull
    for ((_, hr, _, l, _) <- got.toSeq) {
      val t = (hr - mn).toInt - 1
      val window = (0 to 19).map(i => dense(t - i))
      assert(l >= window.min * 1048575L && l <= window.max * 1048576L,
        s"ewma at $hr outside hull")
    }
  }

  test("q_ts_holt: Brown double-smoothing replay; forecast = level + trend exactly") {
    val (mn, dense) = denseHourly()
    val t1 = (0 to 19).map(i => 1L << (20 - i)).sum
    val t2 = (0 to 19).map(i => (i + 1).toLong * (1L << (19 - i))).sum
    val exp = dense.indices.collect { case t if t >= 19 =>
      val s1 = (0 to 19).map(i => dense(t - i) * (1L << (20 - i))).sum / t1
      val s2 = (0 to 19).map(i => dense(t - i) * (i + 1).toLong * (1L << (19 - i))).sum / t2
      (mn + t, dense(t), s1, s2, 2 * s1 - s2, s1 - s2, 3 * s1 - 2 * s2)
    }.sortBy(-_._1).take(24).sortBy(_._1)
      .zipWithIndex.map { case ((hr, n, s1, s2, l, b, f), i) =>
        (i + 1, hr, n, s1, s2, l, b, f)
      }
    val got = rows("q_ts_holt").map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(got.toSeq == exp.toSeq, s"got ${got.toSeq.take(3)}\nexp ${exp.take(3)}")
    // structural identities: level = 2S'−S'', forecast = level + trend
    for ((_, _, _, s1, s2, l, b, f) <- got.toSeq) {
      assert(l == 2 * s1 - s2 && b == s1 - s2 && f == l + b)
    }
  }

  test("q_ts_changepoint: max-CUSUM replay; the top candidate separates the means") {
    val (mn, dense) = denseHourly()
    val sn = dense.sum
    val nn = dense.length.toLong
    val prefix = dense.scanLeft(0L)(_ + _).drop(1)
    val cands = prefix.zipWithIndex.dropRight(1).map { case (s, i0) =>
      val i = i0 + 1L
      (mn + i0, i, s, math.abs(nn * s - i * sn))
    }
    val exp = cands.sortBy { case (hr, _, _, dev) => (-dev, hr) }.take(5)
      .map { case (hr, i, s, dev) =>
        (hr, dev, s * 100 / i, (sn - s) * 100 / (nn - i)) }
    val got = rows("q_ts_changepoint")
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == exp.toSeq)
    // non-degenerate: the winning split's segment means must differ
    assert(got.head._3 != got.head._4, "flat series should not produce a confident changepoint")
  }

  test("q_dim_merge_upsert: full-outer merge replays; all three MERGE branches exercised") {
    val base = Tables.customer(spark, sf)
      .selectExpr("c_custkey", "CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the NOT-MATCHED shift is MAX(c_custkey)+1, derived from the data
    // (round-8 advice: a fixed constant collides past ~sf7)
    val shift = base.keySet.max + 1
    val delta = Tables.orders(spark, sf)
      .selectExpr("o_custkey", "o_orderpriority",
        "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").collect()
      .filter(_.getString(1) == "1-URGENT")
      .map(r => (if (r.getLong(0) % 11 == 5) r.getLong(0) + shift else r.getLong(0),
        r.getLong(2)))
      .groupBy(_._1).map { case (k, xs) => k -> (xs.map(_._2).sum, xs.length.toLong) }
    val exp = (base.keySet ++ delta.keySet).toSeq.sorted.collect {
      case k if k % 13 == 0 =>
        val action =
          if (!base.contains(k)) "INSERT" else if (!delta.contains(k)) "KEEP" else "UPDATE"
        val (d, n) = delta.getOrElse(k, (0L, 0L))
        (k, action, base.getOrElse(k, 0L) + d, n)
    }
    val got = rows("q_dim_merge_upsert")
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == exp)
    // the fixture must exercise every MERGE branch or the operator is
    // under-tested: shifted keys insert, urgent customers update, rest keep
    assert(got.map(_._2).toSet == Set("INSERT", "KEEP", "UPDATE"))
    // INSERT rows carry no base balance: their balance is purely the delta
    got.filter(_._2 == "INSERT").foreach { case (k, _, bal, n) =>
      assert(k >= shift && n > 0 && bal == delta(k)._1)
    }
  }

  test("q_join_bloom_pruned: counts replay from a JVM bloom build; no false negatives") {
    val orders = Tables.orders(spark, sf)
      .selectExpr("o_orderkey", "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val fact = Tables.lineitem(spark, sf).selectExpr("l_orderkey").collect().map(_.getLong(0))
    val dimk = orders.collect { case (k, p) if p == "1-URGENT" => k }.toSet
    def hashes(k: Long): (Long, Long) = {
      val p = k * 2654435761L
      (p % 16384, (p / 16384) % 16384)
    }
    val words = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for (k <- dimk; h <- Seq(hashes(k)._1, hashes(k)._2))
      words(h / 63) |= 1L << (h % 63)
    def pass(k: Long): Boolean = {
      val (h1, h2) = hashes(k)
      (words(h1 / 63) & (1L << (h1 % 63))) != 0 && (words(h2 / 63) & (1L << (h2 % 63))) != 0
    }
    val nPass = fact.count(pass)
    val nMatch = fact.count(dimk)
    val r = rows("q_join_bloom_pruned").head
    assert(r.getLong(0) == fact.length.toLong)
    assert(r.getLong(1) == nPass.toLong)
    assert(r.getLong(2) == nMatch.toLong)
    assert(r.getLong(3) == (nPass - nMatch).toLong)
    // the defining Bloom property: every true match passes the filter
    assert(fact.filter(dimk).forall(pass), "bloom dropped a true match")
    assert(r.getInt(5) == 1)
    // the filter must actually prune (otherwise the runtime filter is useless)
    assert(nPass < fact.length, "bloom pruned nothing")
  }

  test("q_stats_kmv_sketch: estimates replay from a JVM KMV build; exact-when-small rule holds") {
    val vals = Tables.orders(spark, sf)
      .selectExpr("o_orderpriority", "o_custkey").collect()
      .map(r => (r.getString(0), r.getLong(1))).distinct
    def h48(v: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(v.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(6).map(b => f"$b%02x").mkString, 16)
    }
    def est(hs: Seq[Long], nd: Long): Long =
      if (nd < 128) nd
      else 127L * 281474976710656L / hs.sorted.apply(127)
    val perGrp = vals.groupBy(_._1).map { case (g, vs) =>
      val hs = vs.map(x => h48(x._2)).toSeq
      g -> (vs.length.toLong, est(hs, vs.length.toLong))
    }
    // merged sketch: k smallest of the union of per-group minima
    val minima = vals.groupBy(_._1).values
      .flatMap(vs => vs.map(x => h48(x._2)).toSeq.distinct.sorted.take(128)).toSeq.distinct
    val allNd = vals.map(_._2).distinct.length.toLong
    val mergedEst =
      if (minima.length < 128) minima.length.toLong
      else 127L * 281474976710656L / minima.sorted.apply(127)
    val got = rows("q_stats_kmv_sketch")
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    for ((g, (nd, e)) <- perGrp) {
      val (gotNd, gotEst, gotErr) = got(g)
      assert(gotNd == nd && gotEst == e, s"group $g: got ${got(g)}, expected ($nd, $e)")
      assert(gotErr == (e - nd).abs * 10000 / nd)
    }
    val (mNd, mEst, _) = got("ALL_MERGED")
    assert(mNd == allNd && mEst == mergedEst)
    // the sketch must stay in the same ballpark as the truth (k=128 → ~9%
    // relative error expected; 25% is a generous 3σ bound)
    got.values.foreach { case (nd, e, _) => assert((e - nd).abs <= nd / 4) }
  }
}
