package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, LongType}

/** Engine-neutral fixed-point logarithm, the native (whole-stage-codegen)
  * form of `graft.llm.NeutralMath.lnScaledCtes`:
  *
  *   graft_ln_scaled(num, den, scale) = FLOOR(ln(num/den)·scale + 0.5)
  *
  * for positive BIGINT num/den. The compute below performs the EXACT
  * operation sequence the SQL CTE chain performs — integer bit-length
  * decomposition, exact power-of-two shifts, one correctly-rounded
  * division, the fixed-degree atanh Horner polynomial, e·ln2 — so its
  * result is bit-identical to the chain evaluated by ANY IEEE-754 engine
  * (the DuckDB oracle runs the chain; Spark runs this). Every operation
  * is required by IEEE 754 to be correctly rounded, so there is no libm
  * last-ulp exposure anywhere (the round-7 DSIR/DoReMi/ppl-bucket hash
  * failures). NeutralMathSpec pins chain == compute on an adversarial
  * sweep including FLOOR-boundary hunters.
  *
  * Why native and not the chain on the Spark side: the 8-stage chain
  * stacks per-row projections that resist CollapseProject (each temp is
  * referenced twice downstream) — measured ~0.25 µs/row interpreted
  * overhead plus per-chain planning cost. This expression is one
  * straight-line static call inside whole-stage codegen.
  */
case class LnScaledMicro(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType, DoubleType)
  override def dataType: DataType = LongType

  override def nullSafeEval(n: Any, d: Any, s: Any): Any =
    LnScaledMicro.compute(n.asInstanceOf[Long], d.asInstanceOf[Long], s.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (n, d, s) =>
      s"${ev.value} = org.apache.spark.sql.graftbridge.LnScaledMicro.compute($n, $d, $s);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): LnScaledMicro =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "graft_ln_scaled"
}

object LnScaledMicro {
  private val Ln2 = 0.6931471805599453 // round-trip literal of ln 2
  private val Sqrt2 = 1.4142135623730951 // round-trip literal of sqrt 2

  /** The op sequence of the SQL chain, verbatim. Must not be "improved":
    * any reordering changes result bits and breaks chain-parity.
    */
  def compute(num: Long, den: Long, scale: Double): Long = {
    require(num > 0 && den > 0, s"graft_ln_scaled domain: num=$num den=$den")
    val e0 = (64 - java.lang.Long.numberOfLeadingZeros(num)) -
      (64 - java.lang.Long.numberOfLeadingZeros(den))
    val m0 = (if (e0 < 0) (num << -e0).toDouble else num.toDouble) /
      (if (e0 > 0) (den << e0).toDouble else den.toDouble)
    var m = m0; var e = e0
    if (m0 < 1.0) { m = m0 + m0; e = e0 - 1 }
    if (m >= Sqrt2) { m = m * 0.5; e = e + 1 }
    val z = (m - 1.0) / (m + 1.0)
    val z2 = z * z
    // z*(2 + z2*(2/3 + z2*(2/5 + ... + z2*(2/15)))) — Horner, literals are
    // the round-trip decimals the SQL chain embeds
    val horner = 2.0 + z2 * (0.6666666666666666 + z2 * (0.4 + z2 * (
      0.2857142857142857 + z2 * (0.2222222222222222 + z2 * (
        0.18181818181818182 + z2 * (0.15384615384615385 + z2 * 0.13333333333333333))))))
    math.floor((z * horner + e.toDouble * Ln2) * scale + 0.5).toLong
  }
}

/** Engine-neutral fixed-point exponential, the native form of
  * `graft.llm.NeutralMath.expMicroCtes`:
  *
  *   graft_exp_micro(x) = FLOOR(exp(x/1e6)·1e6 + 0.5)
  *
  * for integer micro-nat x ≥ 0 with x/1e6 ≤ 29 (the BIGINT fixed-point
  * bound; larger integer parts clamp to e^29, exactly as the chain's
  * CASE ELSE arm does). Same chain-parity contract as [[LnScaledMicro]].
  */
case class ExpMicro(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType

  override def nullSafeEval(x: Any): Any = ExpMicro.compute(x.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = org.apache.spark.sql.graftbridge.ExpMicro.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): ExpMicro =
    copy(child = newChild)

  override def prettyName: String = "graft_exp_micro"
}

object ExpMicro {
  // exp(n) for n = 0..29, the same round-trip literals the chain's CASE
  // lookup embeds (generated from math.exp(n) — parsing the shortest
  // decimal reproduces the identical double in any engine)
  private val expInt: Array[Double] = Array.tabulate(30)(n => math.exp(n.toDouble))
  // 1/k! for the degree-17 Taylor tail, matching the chain's literals
  private val invFact: Array[Double] = {
    var f = 1.0
    Array.tabulate(18) { k => if (k > 0) f *= k; 1.0 / f }
  }

  def compute(xMicro: Long): Long = {
    require(xMicro >= 0, s"graft_exp_micro domain: $xMicro")
    val xn = math.floor(xMicro.toDouble / 1.0e6).toLong
    val xf = (xMicro - xn * 1000000L).toDouble / 1.0e6
    var poly = invFact(17)
    var k = 16
    while (k >= 0) { poly = invFact(k) + xf * poly; k -= 1 }
    val en = expInt(math.min(xn, 29L).toInt)
    math.floor(en * poly * 1.0e6 + 0.5).toLong
  }
}
