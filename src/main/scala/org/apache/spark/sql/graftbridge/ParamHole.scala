package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Unevaluable}
import org.apache.spark.sql.types.DataType

/** Typed placeholder standing where a prepared-statement parameter will be
  * bound (graft.engine.Params.prepareTemplate). It is resolved — it
  * carries the inferred concrete type — so the surrounding plan analyzes
  * once and stays analyzed; at bind time each hole is swapped for a
  * same-type Literal, which cannot un-resolve the tree. Unevaluable
  * because executing a template with an unbound hole is a caller bug.
  *
  * [[sql]] renders as the user's original `$name` marker: analysis
  * auto-aliases unaliased projections from the expression's SQL text, so
  * an unaliased parameter projection like `SELECT id + $1 FROM t` gets
  * the STABLE, value-independent field name `(id + $1)` in both the
  * prepare-time dataset schema and every template execution — instead of
  * leaking an internal `graft_param_1()` token at prepare time and a
  * bound-value-derived name (`(id + 2)`) after a fallback re-plan.
  */
case class ParamHole(name: String, dataType: DataType)
    extends LeafExpression with Unevaluable {
  override def nullable: Boolean = true
  override def prettyName: String = s"graft_param_$name"
  override def sql: String = "$" + name
}
