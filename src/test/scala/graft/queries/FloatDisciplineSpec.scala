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
