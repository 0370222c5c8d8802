package graft.engine

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.TestSpark
import graft.ipc.ArrowCodec

/** Parameter rewrite / inference / decode rules (SURVEY §2.A A8/A20/A22/A25;
  * mirrors service.rs:1085-1105 and 1144-1192 semantics).
  */
class ParamsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.fixtures()

  test("$n rewrite targets named markers and skips strings/comments") {
    val (rewritten, mapping) = Params.rewrite(
      "SELECT '$1' AS lit, id FROM users WHERE id = $1 -- not $2\n AND name != $name")
    assert(rewritten.contains("'$1'"))
    assert(rewritten.contains(":gp_1"))
    assert(rewritten.contains("-- not $2"))
    assert(rewritten.contains(":gp_name"))
    assert(mapping == Map("gp_1" -> "1", "gp_name" -> "name"))
  }

  test("parameter type inferred from comparison with a column (integration_test.rs:156-170)") {
    val types = Params.parameterTypes(spark, "SELECT * FROM users WHERE id = $1")
    assert(types == Seq(("$1", IntegerType)))
  }

  test("parameter types over joins/HAVING, BTreeMap name order (state_test.rs:5-17)") {
    val types = Params.parameterTypes(spark,
      """SELECT u.id, u.name FROM users u
        |LEFT JOIN orders o ON u.id = o.user_id
        |WHERE u.name = $2 AND o.amount > $1
        |GROUP BY u.id, u.name
        |HAVING COUNT(o.order_id) > $3""".stripMargin)
    assert(types.map(_._1) == Seq("$1", "$2", "$3")) // lexicographic order
    assert(types.toMap.apply("$1") == IntegerType)
    assert(types.toMap.apply("$2") == StringType)
    assert(types.toMap.apply("$3") == LongType)
  }

  test("un-inferable parameter errors like the reference (service.rs:1097-1100)") {
    val e = intercept[Params.UninferableParameter] {
      Params.parameterTypes(spark, "SELECT $1 AS v FROM users")
    }
    assert(e.getMessage.contains("$1"))
  }

  test("no parameters → empty schema") {
    assert(Params.parameterTypes(spark, "SELECT * FROM users").isEmpty)
  }

  private def paramStream(fields: Seq[(String, DataType)], row: Row): Array[Byte] = {
    val schema = StructType(fields.map { case (n, t) => StructField(n, t, nullable = false) })
    ArrowCodec.encodeStream(
      spark.createDataFrame(java.util.Arrays.asList(row), schema)).toBytes
  }

  test("all-numeric names decode as positional, sorted by index (service.rs:1174-1183)") {
    val ipc = paramStream(Seq("$2" -> StringType, "$1" -> IntegerType), Row("x", 7))
    Params.decodeParamValues(ipc) match {
      case Some(Params.Positional(values)) => assert(values == Seq(7, "x"))
      case other => fail(s"expected positional, got $other")
    }
  }

  test("non-numeric names decode as a named map with $ stripped (service.rs:1184-1191)") {
    val ipc = paramStream(Seq("$min_amount" -> IntegerType, "$2" -> StringType), Row(5, "y"))
    Params.decodeParamValues(ipc) match {
      case Some(Params.Named(values)) => assert(values == Map("min_amount" -> 5, "2" -> "y"))
      case other => fail(s"expected named, got $other")
    }
  }

  test("bind executes with positional parameters") {
    val ipc = paramStream(Seq("$1" -> IntegerType), Row(3))
    val df = Params.bind(spark, "SELECT name FROM users WHERE id = $1", Some(ipc))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("Charlie"))
  }

  test("bind executes with named parameters") {
    val ipc = paramStream(Seq("$min" -> IntegerType), Row(60))
    val df = Params.bind(spark,
      "SELECT order_id FROM orders WHERE amount > $min ORDER BY order_id", Some(ipc))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(101, 102))
  }
}
