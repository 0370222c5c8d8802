package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two float vectors in a
  * single pass (dot product + both norms accumulated in index order as
  * doubles — bit-identical to the SQL `aggregate(zip_with(...))` fold it
  * replaces, but far cheaper: no per-element lambda interpretation, and
  * `doGenCode` keeps it inside whole-stage codegen).
  *
  * Exercises the engine's function-extension surface (SURVEY §2.B.11): the
  * reference exposes UDF registration through the session hook
  * (session.rs:9-12); a Catalyst expression is the Spark-native equivalent
  * with codegen instead of a boxed Scala closure. Lives in the bridge
  * package because `AbstractDataType` is private[sql].
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any =
    CosineSimilarity.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graftbridge.CosineSimilarity.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_cosine"
}

object CosineSimilarity {
  /** One-pass cosine; accumulators summed in index order (determinism
    * contract with the DuckDB oracle).
    */
  def compute(l: ArrayData, r: ArrayData): Double = {
    val n = math.min(l.numElements(), r.numElements())
    var dot = 0.0
    var n1 = 0.0
    var n2 = 0.0
    var i = 0
    while (i < n) {
      val x = l.getFloat(i).toDouble
      val y = r.getFloat(i).toDouble
      dot += x * y
      n1 += x * x
      n2 += y * y
      i += 1
    }
    dot / (math.sqrt(n1) * math.sqrt(n2))
  }
}
