package graft.llm

/** Engine-neutral transcendental kernels, emitted as shared SQL text.
  *
  * Problem (round-7 verdict): `LN()` / `EXP()` are evaluated by each
  * engine's own libm — Java `StrictMath`-adjacent `Math.log` on the Spark
  * side, the host libc's `log` inside DuckDB — and the two can differ in
  * the LAST ULP. The repo's determinism discipline quantizes log scores to
  * integer micro-nats with `FLOOR(LN(x)·1e6 + 0.5)`; a 1-ulp disagreement
  * at a floor boundary flips one integer micro-nat, and per-doc sums /
  * ntile ranks propagate the flip to the output hash. Queries that
  * evaluate LN once per *gram type* (thousands of draws) hit a boundary
  * with near-certainty at sf0.01.
  *
  * Fix: compute the logs and exps ourselves out of nothing but operations
  * IEEE 754 REQUIRES to be correctly rounded — `+ − × ÷` on doubles,
  * integer arithmetic, comparisons — in SQL text shared verbatim by both
  * dialects. Two engines performing the identical correctly-rounded op
  * sequence on the identical inputs produce bit-identical doubles, so the
  * final FLOOR sees the same bits on both sides and the quantization can
  * never diverge. (Accuracy vs the true log is ~1e-14 relative — far
  * beyond the micro-nat display precision — but the property that matters
  * is *cross-engine identity*, which is exact.)
  *
  * ln(a/b) for positive integers a, b decomposes as
  *
  *   a/b = m · 2^e,  m ∈ [1/√2, √2)
  *   ln(a/b) = 2·atanh(z) + e·ln2,  z = (m−1)/(m+1), |z| < 0.17158
  *
  * where e comes from the integer bit lengths of a and b (exact), the
  * scaling is an integer shift (exact), the one division is correctly
  * rounded, and 2·atanh(z) is a fixed-degree odd polynomial
  * Σ 2·z^(2k+1)/(2k+1), k ≤ 7 (truncation < 1e-14 relative at |z|max).
  * ln2 and the coefficients are round-trip decimal literals in E-notation
  * (both parsers convert decimal→binary correctly rounded, and E-notation
  * forces DOUBLE typing in both dialects — a bare `0.69…` literal parses
  * as DECIMAL in DuckDB and Spark alike).
  *
  * exp(x) for x = k·1e-6 (integer micro-nats, x ∈ [0, 29]) decomposes as
  * exp(n)·exp(f), n = ⌊x⌋ looked up from literal constants, f ∈ [0,1)
  * summed by a degree-17 Taylor polynomial (truncation < 3e-16 relative).
  *
  * Both kernels are emitted as linear CTE chains (each intermediate named
  * once, referenced once) rather than one nested scalar expression: the
  * chain keeps the SQL text linear in the number of steps, and Catalyst /
  * DuckDB collapse single-consumer projections, so there is no
  * re-inlining blowup (the repo's documented CTE-re-inline hazard applies
  * to MULTI-consumer CTEs only).
  *
  * Portability probes (run on Spark 4.1.2 and DuckDB 1.0.0, this repo's
  * two engines): `bin(BIGINT)` → minimal-width binary string in both;
  * `x << n` BIGINT shift in both; `CASE x WHEN … END` switch form in
  * both; `1.41…E0` → DOUBLE in both.
  */
object NeutralMath {

  /** Round-trip double literal, E-notation so both parsers type it DOUBLE. */
  private def lit(d: Double): String = {
    val s = java.lang.Double.toString(d)
    if (s.contains("E") || s.contains("e")) s else s + "E0"
  }

  private val LN2   = lit(math.log(2.0))          // 0.6931471805599453E0
  private val SQRT2 = lit(math.sqrt(2.0))         // 1.4142135623730951E0

  /** Horner form of 2·atanh(z) = z·(2 + z²·(2/3 + z²·(2/5 + …))) over the
    * named columns `_lz` / `_lz2`.
    */
  private val atanhPoly: String = {
    val cs = (0 to 7).map(k => lit(2.0 / (2 * k + 1)))
    val horner = cs.reverse.reduceLeft((acc, c) => s"$c + _lz2 * ($acc)")
    s"_lz * ($horner)"
  }

  /** FLOOR(exp-of-factorial) Taylor for exp(f), f ∈ [0,1), over `_xf`. */
  private val expPoly: String = {
    var fact = 1.0
    val cs = (0 to 17).map { k => if (k > 0) fact *= k; lit(1.0 / fact) }
    cs.reverse.reduceLeft((acc, c) => s"$c + _xf * ($acc)")
  }

  /** Literal-table lookup of exp(n) for the integer part, n ∈ [0, 29]
    * (exp(29)·1e6 ≈ 4·10^18 is the last value whose micro-unit fixed-point
    * fits a BIGINT — callers must bound their exponent accordingly).
    */
  private val expIntCase: String = {
    val arms = (0 to 29).map(n => s"WHEN $n THEN ${lit(math.exp(n.toDouble))}").mkString(" ")
    s"CASE _xn $arms ELSE ${lit(math.exp(29.0))} END"
  }

  /** Emit a CTE chain `<id>_a … <id>` computing
    *
    *   <out> = FLOOR( ln(<num>/<den>) · <scale> + 0.5 )  AS BIGINT
    *
    * engine-neutrally for positive BIGINT expressions `num`, `den`
    * (each < 2^63). `from` is the FROM-clause text of the source relation;
    * `keepIn` the projected pass-through columns as they read off that
    * source (may be qualified / aliased); `keepOut` the same columns by
    * their plain output names. `scale` is a DOUBLE literal such as
    * `"1.0E6"`. The emitted text is dialect-shared — splice the SAME string
    * into the Spark query and the DuckDB oracle.
    */
  def lnScaledCtes(id: String, from: String, keepIn: String, keepOut: String,
                   num: String, den: String, out: String, scale: String): String =
    s"""${id}_a AS (SELECT $keepIn, CAST($num AS BIGINT) AS _ln, CAST($den AS BIGINT) AS _ld FROM $from),
       |${id}_b AS (SELECT *, LENGTH(bin(_ln)) - LENGTH(bin(_ld)) AS _le FROM ${id}_a),
       |${id}_c AS (SELECT *, CAST(CASE WHEN _le < 0 THEN _ln << (0 - _le) ELSE _ln END AS DOUBLE)
       |                    / CAST(CASE WHEN _le > 0 THEN _ld << _le ELSE _ld END AS DOUBLE) AS _lm0 FROM ${id}_b),
       |${id}_d AS (SELECT *, CASE WHEN _lm0 < 1.0E0 THEN _lm0 + _lm0 ELSE _lm0 END AS _lm1,
       |                      CASE WHEN _lm0 < 1.0E0 THEN _le - 1 ELSE _le END AS _le1 FROM ${id}_c),
       |${id}_e AS (SELECT *, CASE WHEN _lm1 >= $SQRT2 THEN _lm1 * 0.5E0 ELSE _lm1 END AS _lm2,
       |                      CASE WHEN _lm1 >= $SQRT2 THEN _le1 + 1 ELSE _le1 END AS _le2 FROM ${id}_d),
       |${id}_f AS (SELECT *, (_lm2 - 1.0E0) / (_lm2 + 1.0E0) AS _lz FROM ${id}_e),
       |${id}_g AS (SELECT *, _lz * _lz AS _lz2 FROM ${id}_f),
       |${id} AS (SELECT $keepOut,
       |                 CAST(FLOOR(($atanhPoly + CAST(_le2 AS DOUBLE) * $LN2) * $scale + 0.5E0) AS BIGINT) AS $out
       |          FROM ${id}_g)""".stripMargin

  /** Emit a CTE chain `<id>_a … <id>` computing
    *
    *   <out> = FLOOR( exp(<xMicro>/1e6) · 1e6 + 0.5 )  AS BIGINT
    *
    * engine-neutrally for a non-negative BIGINT micro-nat expression
    * `xMicro` with xMicro/1e6 ≤ 29 (the BIGINT fixed-point bound). Same
    * splice-both-dialects contract as [[lnScaledCtes]].
    */
  def expMicroCtes(id: String, from: String, keepIn: String, keepOut: String,
                   xMicro: String, out: String): String =
    s"""${id}_a AS (SELECT $keepIn, CAST($xMicro AS BIGINT) AS _xm FROM $from),
       |${id}_b AS (SELECT *, CAST(FLOOR(CAST(_xm AS DOUBLE) / 1.0E6) AS BIGINT) AS _xn FROM ${id}_a),
       |${id}_c AS (SELECT *, CAST(_xm - _xn * 1000000 AS DOUBLE) / 1.0E6 AS _xf FROM ${id}_b),
       |${id} AS (SELECT $keepOut,
       |                 CAST(FLOOR(($expIntCase) * ($expPoly) * 1.0E6 + 0.5E0) AS BIGINT) AS $out
       |          FROM ${id}_c)""".stripMargin

  /** Reference implementation of the emitted ln kernel, for specs: performs
    * the IDENTICAL op sequence in Scala so tests can assert the SQL chain
    * and the JVM agree bit-for-bit, and that the result tracks
    * `math.log` to ≤ 1e-12 relative.
    */
  def lnScaledJvm(num: Long, den: Long, scale: Double): Long = {
    require(num > 0 && den > 0)
    val e0 = (64 - java.lang.Long.numberOfLeadingZeros(num)) -
      (64 - java.lang.Long.numberOfLeadingZeros(den))
    val m0 = (if (e0 < 0) (num << -e0).toDouble else num.toDouble) /
      (if (e0 > 0) (den << e0).toDouble else den.toDouble)
    val (m1, e1) = if (m0 < 1.0) (m0 + m0, e0 - 1) else (m0, e0)
    val (m2, e2) = if (m1 >= math.sqrt(2.0)) (m1 * 0.5, e1 + 1) else (m1, e1)
    val z = (m2 - 1.0) / (m2 + 1.0)
    val z2 = z * z
    val cs = (0 to 7).map(k => 2.0 / (2 * k + 1))
    val horner = cs.reverse.reduceLeft((acc, c) => c + z2 * acc)
    math.floor((z * horner + e2.toDouble * math.log(2.0)) * scale + 0.5).toLong
  }

  /** Reference implementation of the emitted exp kernel, for specs. */
  def expMicroJvm(xMicro: Long): Long = {
    require(xMicro >= 0)
    val xn = math.floor(xMicro.toDouble / 1.0e6).toLong
    val xf = (xMicro - xn * 1000000L).toDouble / 1.0e6
    var fact = 1.0
    val cs = (0 to 17).map { k => if (k > 0) fact *= k; 1.0 / fact }
    val poly = cs.reverse.reduceLeft((acc, c) => c + xf * acc)
    val en = math.exp(math.min(xn, 29L).toDouble)
    math.floor(en * poly * 1.0e6 + 0.5).toLong
  }
}
