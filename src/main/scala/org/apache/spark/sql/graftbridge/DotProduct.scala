package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of a float32 vector with a
  * double vector (e.g. an LSH hyperplane literal), accumulated in index
  * order as doubles — bit-identical to DuckDB's
  * `list_dot_product(list_transform(e, x -> CAST(x AS DOUBLE)), plane)`
  * and to the SQL `aggregate(zip_with(...))` fold, but codegen'd: no
  * per-element lambda interpretation, stays inside whole-stage codegen.
  * Used for the hyperplane sign signatures of the LSH ANN / embedding
  * dedup paths, where the interpreted fold was the dominant cost.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any =
    DotProduct.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graftbridge.DotProduct.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

object DotProduct {
  /** Index-order fold (determinism contract with the DuckDB oracle).
    * Precondition: element slots are non-null (embedding vectors are dense
    * float arrays); a null slot reads as 0.0 here whereas the SQL lambda
    * fold would return NULL — matching the graft_cosine kernel's contract.
    */
  def compute(l: ArrayData, r: ArrayData): Double = {
    val n = math.min(l.numElements(), r.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += l.getFloat(i).toDouble * r.getDouble(i)
      i += 1
    }
    dot
  }
}
