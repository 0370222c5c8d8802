package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Unevaluable}
import org.apache.spark.sql.types.DataType

/** Typed placeholder standing where a prepared-statement parameter will be
  * bound (graft.engine.Params.prepareTemplate). It is resolved — it
  * carries the inferred concrete type — so the surrounding plan analyzes
  * once and stays analyzed; at bind time each hole is swapped for a
  * same-type Literal, which cannot un-resolve the tree. Unevaluable
  * because executing a template with an unbound hole is a caller bug.
  */
case class ParamHole(name: String, dataType: DataType)
    extends LeafExpression with Unevaluable {
  override def nullable: Boolean = true
  override def prettyName: String = s"graft_param_$name"
}
