package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** [[DotProduct]] for two double vectors (e.g. fixed-point-quantized
  * embeddings, where every element is an integer-valued double and the dot
  * is exact in ANY fold order — the determinism basis of the k-means
  * assignment query). Same index-order fold and null contract as
  * [[DotProduct]]; codegen'd for the same reason.
  */
case class DotProductDD(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any =
    DotProductDD.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graftbridge.DotProductDD.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductDD =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot_d"
}

object DotProductDD {
  def compute(l: ArrayData, r: ArrayData): Double = {
    val n = math.min(l.numElements(), r.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += l.getDouble(i) * r.getDouble(i)
      i += 1
    }
    dot
  }
}
