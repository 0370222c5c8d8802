package graft.substrait

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.protocol.Proto.Writer
import SubstraitBuilder._

/** Unit coverage for decoder shapes the oracle queries no longer (or
  * cannot) exercise: JoinRel.post_join_filter (q_substrait_join moved its
  * predicate to a FilterRel because Acero silently drops post_join_filter
  * — the decoder still honors it), set-op semantics, and the
  * error-not-guess paths (unsupported relation/set-op/second grouping,
  * mirroring the reference's behavior for plans its consumer cannot map,
  * service.rs:1018-1029).
  */
class SubstraitSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.fixtures()

  private def msgW(b: Writer => Unit): Array[Byte] = {
    val w = new Writer(); b(w); w.result()
  }

  private def usersRead = readNamed("users", Seq(
    "id" -> typ(I32), "name" -> typ(STR)))
  private def ordersRead = readNamed("orders", Seq(
    "order_id" -> typ(I32), "user_id" -> typ(I32), "amount" -> typ(I32)))

  test("JoinRel.post_join_filter is applied by the decoder") {
    val fns = Seq(
      Fn(1, UriComparison, "equal:any_any"),
      Fn(2, UriComparison, "gt:any_any"))
    // combined frame [id, name, order_id, user_id, amount]
    val joined = join(usersRead, ordersRead,
      fn(1, typ(BOOL), fieldRef(0), fieldRef(3)), Inner,
      postFilter = Some(fn(2, typ(BOOL), fieldRef(4), litI32(30))))
    val trimmed = project(joined, Seq(fieldRef(1), fieldRef(4)), Some(Seq(5, 6)))
    val sorted = sort(trimmed, Seq(fieldRef(1) -> AscLast))
    val df = SubstraitDecoder.decode(spark,
      plan(sorted, Seq("name", "amount"), fns))
    val expected = spark.sql(
      """SELECT name, amount FROM users u JOIN orders o ON u.id = o.user_id
        |WHERE amount > 30 ORDER BY amount""".stripMargin)
    assert(df.collect().toSeq == expected.collect().toSeq)
    assert(df.columns.toSeq == Seq("name", "amount"))
  }

  test("SetRel UNION_DISTINCT dedups across inputs") {
    val unioned = set(Seq(usersRead, usersRead), UnionDistinct)
    val df = SubstraitDecoder.decode(spark,
      plan(sort(unioned, Seq(fieldRef(0) -> AscLast)), Seq("id", "name"), Nil))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3))
  }

  test("SetRel rejects unsupported ops and mismatched widths by name") {
    val minus = intercept[IllegalArgumentException] {
      SubstraitDecoder.decode(spark, plan(set(Seq(usersRead, usersRead), 1), Nil, Nil))
    }
    assert(minus.getMessage.contains("unsupported set op 1"))
    val width = intercept[IllegalArgumentException] {
      SubstraitDecoder.decode(spark, plan(set(Seq(usersRead, ordersRead), UnionAll), Nil, Nil))
    }
    assert(width.getMessage.contains("mismatched widths"))
  }

  test("multiple groupings lower to grouping sets with the substrait output contract") {
    val fns = Seq(Fn(1, UriAggGeneric, "count:"))
    // reference style: grouping_expressions table + expression_references
    // over orders [order_id, user_id, amount]: sets ((user_id), ())
    val agg = aggregateSets(ordersRead,
      groupingExpressions = Seq(fieldRef(1)),
      sets = Seq(Seq(0), Seq()),
      measures = Seq(measure(1, typ(I64), Nil)))
    val sorted = sort(agg, Seq(fieldRef(2) -> AscLast, fieldRef(0) -> AscLast))
    val df = SubstraitDecoder.decode(spark,
      plan(sorted, Seq("user_id", "n", "gset"), fns))
    val expected = spark.sql(
      """SELECT user_id, COUNT(*) AS n,
        |       CAST(CASE WHEN GROUPING(user_id) = 0 THEN 0 ELSE 1 END AS INT) AS gset
        |FROM orders GROUP BY GROUPING SETS ((user_id), ())
        |ORDER BY gset, user_id""".stripMargin)
    assert(df.collect().toSeq == expected.collect().toSeq)
    assert(df.columns.toSeq == Seq("user_id", "n", "gset"))
  }

  test("a grouping expression reference out of range errors clearly") {
    val fns = Seq(Fn(1, UriAggGeneric, "count:"))
    val agg = aggregateSets(ordersRead,
      groupingExpressions = Seq(fieldRef(1)),
      sets = Seq(Seq(0), Seq(3)),
      measures = Seq(measure(1, typ(I64), Nil)))
    val e = intercept[IllegalArgumentException] {
      SubstraitDecoder.decode(spark, plan(agg, Nil, fns))
    }
    assert(e.getMessage.contains("grouping expression reference 3 out of range"))
  }

  test("an unsupported relation errors with its tag, never guesses") {
    // extension_single = Rel oneof tag 9 — a relation this consumer
    // deliberately does not map
    val extensionSingle = msgW(_.bytesField(9, msgW(_.bytesField(1, usersRead))))
    val e = intercept[IllegalArgumentException] {
      SubstraitDecoder.decode(spark, plan(extensionSingle, Nil, Nil))
    }
    assert(e.getMessage.contains("unsupported relation tag 9"))
  }

  test("window expressions decode: partitioned rank over the fixtures") {
    val fns = Seq(Fn(1, UriArithmetic, "row_number:"))
    // orders [order_id, user_id, amount] + rank by amount desc per user
    val ranked = project(ordersRead, Seq(
      cast(windowFn(1, typ(I64),
        partitions = Seq(fieldRef(1)),
        sorts = Seq(fieldRef(2) -> DescLast, fieldRef(0) -> AscLast)), typ(I32))))
    val trimmed = project(ranked, Seq(fieldRef(1), fieldRef(0), fieldRef(3)), Some(Seq(4, 5, 6)))
    val sorted = sort(trimmed, Seq(fieldRef(0) -> AscLast, fieldRef(2) -> AscLast))
    val df = SubstraitDecoder.decode(spark,
      plan(sorted, Seq("user_id", "order_id", "rk"), fns))
    val expected = spark.sql(
      """SELECT user_id, order_id,
        |       CAST(row_number() OVER (PARTITION BY user_id
        |                               ORDER BY amount DESC, order_id) AS INT) AS rk
        |FROM orders ORDER BY user_id, rk""".stripMargin)
    assert(df.collect().toSeq == expected.collect().toSeq)
  }

  test("explicit numeric window frame bounds are rejected by name") {
    val fns = Seq(Fn(1, UriArithmetic, "sum:i32"))
    // hand-encode a WindowFunction with lower_bound = Preceding(2)
    val winWithBound = msgW(_.bytesField(5, msgW { w =>
      w.varintField(1, 1L)
      w.bytesField(3, msgW { sf => sf.bytesField(1, fieldRef(0)); sf.varintField(2, 2L) })
      w.bytesField(5, msgW(_.bytesField(1, msgW(_.varintField(1, 2L))))) // Preceding{offset=2}
      w.bytesField(7, typ(I64))
      w.bytesField(9, msgW(_.bytesField(3, fieldRef(2))))
    }))
    val e = intercept[IllegalArgumentException] {
      SubstraitDecoder.decode(spark,
        plan(project(ordersRead, Seq(winWithBound)), Nil, fns))
        .collect()
    }
    assert(e.getMessage.contains("explicit numeric window frame bounds"))
  }

  test("an unsupported window function errors by name") {
    val fns = Seq(Fn(1, UriArithmetic, "median:fp64"))
    val win = windowFn(1, typ(FP64), Nil, Seq(fieldRef(0) -> AscLast), Seq(fieldRef(2)))
    val e = intercept[IllegalArgumentException] {
      SubstraitDecoder.decode(spark,
        plan(project(ordersRead, Seq(win)), Nil, fns)).collect()
    }
    assert(e.getMessage.contains("unsupported window function median"))
  }

  test("NOT IN subquery lowers to a left_anti join; residual conjuncts stay filters") {
    val fns = Seq(
      Fn(1, UriBoolean, "and:bool"),
      Fn(2, UriBoolean, "not:bool"),
      Fn(3, UriComparison, "gt:any_any"))
    // users NOT IN (user_ids with an order over 60) AND id > 0
    val haystack = project(
      filterRel(ordersRead, fn(3, typ(BOOL), fieldRef(2), litI32(60))),
      Seq(fieldRef(1)), Some(Seq(3)))
    val cond = fn(1, typ(BOOL),
      fn(2, typ(BOOL), inSubquery(Seq(fieldRef(0)), haystack)),
      fn(3, typ(BOOL), fieldRef(0), litI32(0)))
    val sorted = sort(filterRel(usersRead, cond), Seq(fieldRef(0) -> AscLast))
    val df = SubstraitDecoder.decode(spark, plan(sorted, Seq("id", "name"), fns))
    val expected = spark.sql(
      """SELECT id, name FROM users
        |WHERE id NOT IN (SELECT user_id FROM orders WHERE amount > 60) AND id > 0
        |ORDER BY id""".stripMargin)
    assert(df.collect().toSeq == expected.collect().toSeq)
    val p = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.optimizedPlan.toString
    assert(p.contains("LeftAnti"), s"NOT IN must plan a left_anti join:\n$p")
  }

  test("IN-subquery arity mismatch and non-filter subqueries error by name") {
    val fns = Seq(Fn(1, UriBoolean, "and:bool"))
    val haystack = ordersRead // 3 columns vs 1 needle
    val bad = filterRel(usersRead, inSubquery(Seq(fieldRef(0)), haystack))
    val e1 = intercept[IllegalArgumentException] {
      SubstraitDecoder.decode(spark, plan(bad, Nil, fns))
    }
    assert(e1.getMessage.contains("IN-subquery arity 1 != haystack width 3"))
    // a subquery inside a projection expression is out of scope — clear error
    val proj = project(usersRead, Seq(inSubquery(Seq(fieldRef(0)), ordersRead)))
    val e2 = intercept[IllegalArgumentException] {
      SubstraitDecoder.decode(spark, plan(proj, Nil, fns))
    }
    assert(e2.getMessage.contains("only as (NOT) IN predicates"))
  }

  test("empty plan bytes fail with the no-relations error") {
    val e = intercept[IllegalArgumentException] {
      SubstraitDecoder.decode(spark, Array.emptyByteArray)
    }
    assert(e.getMessage.contains("plan has no relations"))
  }
}
