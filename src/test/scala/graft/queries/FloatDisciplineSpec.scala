package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Round-8 float-discipline pin: no query in the matrix may depend on an
  * engine-native transcendental (libm log/exp/pow differ between engines
  * in the last ulp, and the repo's FLOOR-to-integer quantization turns a
  * one-ulp disagreement into a flipped integer — the round-7 DSIR/DoReMi/
  * ppl-bucket hash failures). The engine-neutral kernels in
  * [[graft.llm.NeutralMath]] replace them with IEEE-exact op sequences.
  *
  * The pin scans the ORACLE SQL (the observable half of every pair: if
  * the oracle is transcendental-free and the driver hash-matches, the
  * Spark side is forced to the same values), and keeps an explicit
  * allowlist where a native call is the POINT of the query:
  *
  *  - q_fn_math: the scalar math FUNCTION FAMILY is the operator under
  *    test (SURVEY §2.B.8) — LN/LOG10/POWER must appear. Exposure
  *    argument: constant inputs (literal test vectors), display-ROUNDed;
  *    a last-ulp flip would need the rounded digit boundary to fall
  *    within 1 ulp of the true value for one of a handful of fixed
  *    inputs — checked green since round 2 across every driver run.
  *  - q_udaf_geomean: the JVM Aggregator (UDAF extension hook, §2.B.11)
  *    is the operator under test; DuckDB mirrors with EXP(AVG(LN)).
  *    Exposure: per-element relative error ≤ 2^-52 propagates through
  *    AVG to gm·(1 ± ~1e-15); the ROUND(…, 2) display on a ~1e5-scale
  *    value has a boundary quantum of 1e-2 — a 1e-10 absolute
  *    perturbation flips it only if gm sits within 1e-10 of a .xx5
  *    boundary, probability ~1e-8 per group per fixture.
  *
  * SQRT is exempt everywhere: IEEE 754 requires correctly-rounded square
  * root (it is one of the five basic operations), so identical inputs
  * give identical bits in both engines.
  */
class FloatDisciplineSpec extends AnyFunSuite {

  private val native = raw"(?i)\b(LN|LOG|LOG2|LOG10|EXP|POWER|POW)\s*\(".r

  private val allowlist = Map(
    "q_fn_math" -> "scalar math function family under test (see Scaladoc)",
    "q_udaf_geomean" -> "JVM UDAF under test; EXP(AVG(LN)) oracle mirror (see Scaladoc)"
  )

  /** Round-9 pin (round-8 verdict root cause): NO oracle SQL may ROUND a
    * quotient. DuckDB types `x / 1000000.0` as DOUBLE division followed
    * by double ROUND (half-way behavior engine/version-dependent), while
    * Spark parses the identical text as DECIMAL division + exact decimal
    * HALF_UP — two arithmetic domains meeting at the display edge flipped
    * whole values on 7 driver rows. The repo discipline is to emit
    * full-precision quotients of exact integers (one correctly-rounded
    * IEEE op — bit-identical across engines) or integer units, never a
    * rounded quotient.
    *
    * Additional allowlist entry: q_fn_math2's trig family (SIN/COS/ATAN/
    * ASIN/CBRT are the operators under test; libm ulp exposure is the
    * same constant-input argument as q_fn_math, green since round 2).
    */
  private val roundDivAllow: Set[String] =
    allowlist.keySet + "q_fn_math2"

  /** Bodies of every ROUND(...) call in `sql`, paren-balanced. */
  private def roundBodies(sql: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val m = raw"(?i)\bROUND\s*\(".r
    for (h <- m.findAllMatchIn(sql)) {
      var depth = 1
      var j = h.end
      while (j < sql.length && depth > 0) {
        sql.charAt(j) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
        }
        j += 1
      }
      out += sql.substring(h.end, j - 1)
    }
    out.result()
  }

  test("no oracle SQL contains a division inside ROUND(...)") {
    val offenders = graft.SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) if !roundDivAllow.contains(name) =>
        val bad = roundBodies(sql).filter(_.contains("/"))
        if (bad.nonEmpty)
          Some(s"$name: ROUND(${bad.head.linesIterator.mkString(" ").take(90)}...)")
        else None
      case _ => None
    }
    assert(offenders.isEmpty,
      "ROUND-of-quotient (round-8 red-row class) outside the allowlist:\n" +
        offenders.mkString("\n"))
  }

  /** Bare (non-E-notation) decimal literals as division operands put
    * Spark in the DECIMAL domain and DuckDB in the DOUBLE domain — legal
    * ONLY inside a FLOOR/CEIL integer quantization, where both domains
    * provably agree (the quantization targets are ≥ 1/(2·den) away from
    * the boundary, far beyond either domain's rounding error; the
    * repo-wide `FLOOR(x * 10000.0 / n + 0.5)` basis-point idiom).
    */
  /** Round-9 classification pin (round-8 verdict #7): EVERY oracle SQL
    * that still uses ROUND is enumerated here with the argument for why
    * its rounding is engine-safe. Categories (full table in SCALE.md):
    *
    *  - per-row-ieee: the ROUND input is a chain of correctly-rounded
    *    IEEE ops on identical per-row inputs (or an exact MIN/MAX /
    *    frame-ordered fold of such values) — bit-identical in both
    *    engines before rounding. Residual exposure: the two engines'
    *    double-ROUND half-way semantics differ, which matters only when
    *    the value's shortest decimal representation lands exactly on a
    *    …5 at the rounded digit — probability ~1e-8 per row, green for
    *    9 driver rounds.
    *  - int-exact-agg: ROUND of AVG over integers — both engines divide
    *    an exact integer sum by an exact count, one correctly-rounded
    *    division, bit-identical.
    *  - order-stat-display: median/percentile interpolation between two
    *    order statistics — same closed formula in both engines on exact
    *    ints.
    *  - double-agg-display: the pre-round value is a multi-row double
    *    fold whose low bits CAN differ across engines (fold order);
    *    ROUND is load-bearing noise suppression. Kept only where the
    *    engine-native statistical function is the operator under test
    *    (q_agg_stats) or the values sit ~9 orders of magnitude above
    *    the rounding quantum (q_cte's >9e5 spend at 2 decimals).
    *  - native-fn-family: q_fn_math/q_fn_math2/q_udaf_geomean — the
    *    libm function is the operator under test; ROUND bounds the ulp
    *    exposure.
    *
    * A NEW query adding ROUND must be classified here (and in SCALE.md)
    * or the pin fails — display rounding never again ships unexamined.
    */
  private val roundClassified: Map[String, String] = {
    val perRow = Seq("q_agg_arg_minmax", "q_agg_ungrouped", "q_ann_graph_search",
      "q_ann_hard_negatives", "q_ann_hnsw_search", "q_ann_ivf", "q_ann_ivf_hier",
      "q_ann_knn_graph", "q_ann_lsh", "q_ann_topk", "q_ann_topk_native",
      "q_dedup_embedding", "q_dedup_semantic", "q_embed_project",
      "q_embed_quantize", "q_fn_array", "q_fn_conditional", "q_fn_struct",
      "q_join_lateral", "q_sample_coreset", "q_scan_project",
      "q_search_hybrid_batch", "q_search_hybrid_ivf", "q_search_hybrid_rrf",
      "q_search_rag_pack", "q_search_rerank_probe", "q_src_orc_roundtrip",
      "q_text_bm25", "q_text_quality", "q_win_lag", "q_win_nth",
      "q_win_percent", "q_win_range_frame", "q_win_rows_frame")
    (perRow.map(_ -> "per-row-ieee") ++ Seq(
      "q_text_stats" -> "int-exact-agg",
      "q_text_train_split" -> "int-exact-agg",
      "q_text_quality_calibrate" -> "int-exact-agg",
      "q_agg_median" -> "order-stat-display",
      "q_agg_percentile_within" -> "order-stat-display",
      "q_agg_stats" -> "double-agg-display",
      "q_cte" -> "double-agg-display",
      "q_fn_math" -> "native-fn-family",
      "q_fn_math2" -> "native-fn-family",
      "q_udaf_geomean" -> "native-fn-family")).toMap
  }

  test("every ROUND-bearing oracle SQL is classified (and only those)") {
    val re = raw"(?i)\bROUND\s*\(".r
    val actual = graft.SparkEntry.oracleSql.collect {
      case (n, sql) if re.findFirstIn(sql).isDefined => n
    }.toSet
    val classified = roundClassified.keySet
    val unclassified = actual -- classified
    val stale = classified -- actual
    assert(unclassified.isEmpty,
      s"ROUND used without a float-discipline classification: ${unclassified.toSeq.sorted}")
    assert(stale.isEmpty,
      s"classified queries no longer use ROUND — drop them: ${stale.toSeq.sorted}")
  }

  test("bare decimal-literal division only inside FLOOR/CEIL quantization") {
    val div = raw"/\s*[0-9]+\.[0-9]+(?![0-9eE])".r
    val offenders = graft.SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) if !roundDivAllow.contains(name) =>
        div.findAllMatchIn(sql).flatMap { m =>
          // inside FLOOR( or CEIL( iff an unmatched opener of that name
          // precedes the match position
          val prefix = sql.substring(0, m.start)
          val opens = raw"(?i)\b(FLOOR|CEIL|CEILING)\s*\(".r
            .findAllMatchIn(prefix).map(_.end - 1).toList
          val inQuant = opens.exists { p =>
            var depth = 0
            var j = p
            var open = false
            while (j < m.start && depth >= 0) {
              sql.charAt(j) match {
                case '(' => depth += 1
                case ')' => depth -= 1
                case _ =>
              }
              j += 1
            }
            open = depth > 0
            open
          }
          if (inQuant) None
          else Some(s"$name: ...${sql.substring(Math.max(0, m.start - 40), Math.min(sql.length, m.end + 10)).linesIterator.mkString(" ")}...")
        }.take(1)
      case _ => None
    }
    assert(offenders.isEmpty,
      "bare decimal-literal division outside FLOOR/CEIL quantization " +
        "(Spark DECIMAL vs DuckDB DOUBLE domain split):\n" + offenders.mkString("\n"))
  }

  test("every oracle SQL is engine-native-transcendental-free (allowlist excepted)") {
    val offenders = graft.SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) if !allowlist.contains(name) =>
        val hits = native.findAllIn(sql).toList
        if (hits.nonEmpty) Some(s"$name: ${hits.distinct.mkString(",")}") else None
      case _ => None
    }
    assert(offenders.isEmpty,
      "engine-native transcendental outside the allowlist:\n" + offenders.mkString("\n"))
  }

  test("the allowlist entries still exist and still use their native calls") {
    // if one is removed or converted, drop it from the allowlist so the
    // main pin guards it again
    for ((name, _) <- allowlist) {
      val sql = graft.SparkEntry.oracleSql.get(name)
      assert(sql.isDefined, s"$name left the matrix — remove from allowlist")
      assert(native.findFirstIn(sql.get).isDefined,
        s"$name no longer uses a native transcendental — remove from allowlist")
    }
  }
}
