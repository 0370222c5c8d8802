package graft.substrait

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{QuerySpec, Tables}
import SubstraitBuilder._

/** Oracle-backed inventory entries for the Substrait execution path
  * (SURVEY §2.A9/A11): each builds a plan with [[SubstraitBuilder]] —
  * exactly the bytes a Flight SQL client would put in
  * `CommandStatementSubstraitPlan.plan` — decodes it through
  * [[SubstraitDecoder]], and runs the resulting DataFrame against the
  * DuckDB SQL twin. This puts the substrait consumer under the same
  * rows+schema+hash gate as every SQL operator, not just a unit spec.
  *
  * Determinism: final sort on a unique key set; the only double arithmetic
  * is an exact DECIMAL(18,2) fold cast back to DOUBLE (CLAUDE.md rules).
  */
object SubstraitQueries {

  /** read(orders) → filter(custkey%10=3) → project(cast decimal) →
    * aggregate(priority; count(*), sum) → project(cast fp64) → sort.
    */
  private def aggPlan(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    val fns = Seq(
      Fn(1, UriComparison, "equal:any_any"),
      Fn(2, UriArithmetic, "modulus:i64_i64"),
      Fn(3, UriAggGeneric, "count:"),
      Fn(4, UriArithmetic, "sum:dec"))
    val read = readNamed("orders", Seq(
      "o_custkey" -> typ(I64),
      "o_totalprice" -> typ(FP64),
      "o_orderpriority" -> typ(STR)))
    val cond = fn(1, typ(BOOL),
      fn(2, typ(I64), fieldRef(0), litI64(10)), litI64(3))
    val filtered = filterRel(read, cond)
    // direct [ck, tp, pri, dec(tp)] → emit [pri, dec]
    val projected = project(filtered,
      Seq(cast(fieldRef(1), decimalType(18, 2))), Some(Seq(2, 3)))
    val agged = aggregate(projected,
      groups = Seq(fieldRef(0)),
      measures = Seq(
        measure(3, typ(I64), Nil),
        measure(4, decimalType(38, 2), Seq(fieldRef(1)))))
    // direct [pri, n, s, fp64(s)] → emit [pri, n, fp64(s)]
    val recast = project(agged,
      Seq(cast(fieldRef(2), typ(FP64))), Some(Seq(0, 1, 3)))
    val sorted = sort(recast, Seq(fieldRef(0) -> AscLast))
    val bytes = plan(sorted, Seq("o_orderpriority", "n", "total"), fns)
    SubstraitDecoder.decode(spark, bytes)
  }

  /** read(customer) ⋈ read(orders) on custkey → post filter → emit →
    * sort → fetch: the join/fetch arms under the oracle gate.
    */
  private def joinPlan(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    val fns = Seq(
      Fn(1, UriComparison, "equal:any_any"),
      Fn(2, UriComparison, "gt:any_any"))
    val cust = readNamed("customer", Seq(
      "c_custkey" -> typ(I64),
      "c_mktsegment" -> typ(STR)))
    val ords = readNamed("orders", Seq(
      "o_orderkey" -> typ(I64),
      "o_custkey" -> typ(I64),
      "o_totalprice" -> typ(FP64)))
    // combined frame [c_custkey, c_mktsegment, o_orderkey, o_custkey, o_totalprice]
    val joined = join(cust, ords,
      fn(1, typ(BOOL), fieldRef(0), fieldRef(3)), Inner,
      postFilter = Some(fn(2, typ(BOOL), fieldRef(4), litF64(100000.0))))
    // passthrough project + emit trimming to [o_orderkey, c_mktsegment, o_totalprice]
    // (the canonical producer pattern: new exprs appended after the 5 input
    // fields, emit selecting only them)
    val trimmed = project(joined,
      Seq(fieldRef(2), fieldRef(1), fieldRef(4)), Some(Seq(5, 6, 7)))
    val sorted = sort(trimmed, Seq(fieldRef(0) -> AscLast))
    val limited = fetch(sorted, 0, 50)
    val bytes = plan(limited, Seq("o_orderkey", "c_mktsegment", "price"), fns)
    SubstraitDecoder.decode(spark, bytes)
  }

  val specs: Map[String, QuerySpec] = Map(
    "q_substrait_exec" -> QuerySpec.df(aggPlan,
      """SELECT o_orderpriority, COUNT(*) AS n,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders WHERE o_custkey % 10 = 3
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin),

    "q_substrait_join" -> QuerySpec.df(joinPlan,
      """SELECT o_orderkey, c_mktsegment, o_totalprice AS price
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |WHERE o_totalprice > 100000.0
        |ORDER BY o_orderkey LIMIT 50""".stripMargin))
}
