package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import org.apache.spark.sql.graftbridge.{CosineSimilarity, DotProduct, DotProductDD, SortedOverlap, WordNgrams}

/** The engine's `SparkSessionExtensions` entry point: set
  * `spark.sql.extensions=graft.plans.GraftSparkSessionExtension` and every
  * session gets the graft functions (no imperative
  * `GraftFunctions.register` call needed) plus the engine's optimizer
  * rules. This is the public, config-driven way to ship Catalyst
  * extensions — the Spark-native analogue of the reference's per-session
  * function-registration hook (examples/bearer_auth_flight_sql.rs:95-114),
  * applied at session construction instead of per request.
  */
class GraftSparkSessionExtension extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((new FunctionIdentifier("graft_dot_d"),
      new ExpressionInfo(classOf[DotProductDD].getName, "graft_dot_d"),
      (exprs: Seq[Expression]) => DotProductDD(exprs(0), exprs(1))))
    ext.injectFunction((new FunctionIdentifier("graft_overlap"),
      new ExpressionInfo(classOf[SortedOverlap].getName, "graft_overlap"),
      (exprs: Seq[Expression]) => SortedOverlap(exprs(0), exprs(1))))
    ext.injectFunction((new FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "graft_ngrams"),
      (exprs: Seq[Expression]) => WordNgrams(exprs(0), exprs(1))))
    ext.injectOptimizerRule(_ => CanonicalizeCosine)
  }
}

/** Optimizer rule: order the arguments of the commutative graft_cosine
  * deterministically so calls that differ only in argument order become
  * the SAME expression — Catalyst's common-subexpression elimination then
  * computes them once. Bit-safe: the kernel's dot fold is
  * element-wise-commutative (x*y == y*x per IEEE 754) and the norm
  * product sqrt(n1)*sqrt(n2) commutes, so the swapped call returns the
  * identical double.
  */
object CanonicalizeCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case CosineSimilarity(l, r) if l.sql > r.sql => CosineSimilarity(r, l)
  }
}
