package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, StringType}

/** Native Catalyst expression: intersection size of two SORTED string
  * arrays (ascending binary order, i.e. array_sort output) via a linear
  * merge — the verification kernel of the set-similarity joins.
  *
  * `size(array_intersect(a, b))` builds a hash set per row in a generic
  * (non-codegen) eval — measured ~7 µs/row on 25-element word sets, the
  * dominant cost of the prefix-filter Jaccard verify at 443k candidate
  * pairs. The sorted merge is allocation-free, O(|a|+|b|), and stays
  * inside whole-stage codegen (same pattern as [[DotProduct]]).
  *
  * Distinctness contract: inputs are sets (built by collect_set); with
  * duplicate elements the merge counts matched element OCCURRENCE pairs
  * min-wise, like a multiset intersection, which equals the set
  * intersection for distinct inputs.
  */
case class SortedOverlap(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))

  override def dataType: DataType = IntegerType

  override def nullSafeEval(l: Any, r: Any): Any =
    SortedOverlap.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graftbridge.SortedOverlap.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedOverlap =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_overlap"
}

object SortedOverlap {
  /** Linear merge over ascending-sorted arrays (UTF8String binary order —
    * the same ordering array_sort applies to strings).
    */
  def compute(l: ArrayData, r: ArrayData): Int = {
    val nl = l.numElements()
    val nr = r.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < nl && j < nr) {
      val cmp = l.getUTF8String(i).compareTo(r.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }
}
