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

  /** JVM reference implementation = the native Catalyst expression's
    * compute ([[org.apache.spark.sql.graftbridge.LnScaledMicro]]) — ONE
    * op-sequence definition serves the codegen'd Spark path, the spec
    * pins, and the chain-parity argument.
    */
  def lnScaledJvm(num: Long, den: Long, scale: Double): Long =
    org.apache.spark.sql.graftbridge.LnScaledMicro.compute(num, den, scale)

  /** JVM reference implementation of the exp kernel (same contract). */
  def expMicroJvm(xMicro: Long): Long =
    org.apache.spark.sql.graftbridge.ExpMicro.compute(xMicro)

  /** Spark-side scalar form: the native codegen'd expression performing
    * the IDENTICAL op sequence as [[lnScaledCtes]] (pinned bit-for-bit by
    * NeutralMathSpec). Use this in Spark dialect texts — one straight-line
    * call inside whole-stage codegen; the 8-stage CTE chain is the ORACLE
    * form (DuckDB has no extension hook, and the chain's stacked
    * projections resist CollapseProject on the Spark side, measured
    * ~0.25 µs/row interpreted overhead plus per-chain planning cost).
    */
  def lnScaledSpark(num: String, den: String, scale: String): String =
    s"graft_ln_scaled(CAST($num AS BIGINT), CAST($den AS BIGINT), $scale)"

  /** Spark-side scalar exp form (see [[lnScaledSpark]]). */
  def expMicroSpark(x: String): String =
    s"graft_exp_micro(CAST($x AS BIGINT))"

  /** Splice strategy: how a dialect text embeds the neutral kernels. Both
    * strategies emit a CTE named `id` exposing columns keepOut + out, so a
    * tail builder written once against this interface generates BOTH the
    * Spark text (native expression, [[SparkKernel]]) and the DuckDB oracle
    * (IEEE-exact chain, [[OracleKernel]]) from a single source — the
    * shared-tail discipline survives the native-function split.
    */
  sealed trait KernelSplice {
    def ln(id: String, from: String, keepIn: String, keepOut: String,
           num: String, den: String, out: String, scale: String): String
    def exp(id: String, from: String, keepIn: String, keepOut: String,
            x: String, out: String): String
  }

  /** Spark dialect: one CTE wrapping the codegen'd native call. */
  case object SparkKernel extends KernelSplice {
    def ln(id: String, from: String, keepIn: String, keepOut: String,
           num: String, den: String, out: String, scale: String): String =
      s"$id AS (SELECT $keepIn, ${lnScaledSpark(num, den, scale)} AS $out FROM $from)"
    def exp(id: String, from: String, keepIn: String, keepOut: String,
            x: String, out: String): String =
      s"$id AS (SELECT $keepIn, ${expMicroSpark(x)} AS $out FROM $from)"
  }

  /** Oracle dialect: the chain of IEEE-exact CTE stages. */
  case object OracleKernel extends KernelSplice {
    def ln(id: String, from: String, keepIn: String, keepOut: String,
           num: String, den: String, out: String, scale: String): String =
      lnScaledCtes(id, from, keepIn, keepOut, num, den, out, scale)
    def exp(id: String, from: String, keepIn: String, keepOut: String,
            x: String, out: String): String =
      expMicroCtes(id, from, keepIn, keepOut, x, out)
  }
}
