package graft.protocol

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import Commands._

/** Codec round-trips mirroring the reference's
  * tests/state_test.rs:3-37 (QueryHandle with a multi-clause parameterized
  * query; empty query) plus seeded randomized round-trips over arbitrary
  * strings/bytes.
  */
class CodecSpec extends AnyFunSuite {

  // The exact SQL of state_test.rs:5-17.
  private val complexSql =
    """SELECT a.id, a.name, b.order_date
      |FROM users a
      |LEFT JOIN orders b ON a.id = b.user_id
      |WHERE a.active = $1 AND b.amount > $2
      |GROUP BY a.id, a.name, b.order_date
      |HAVING COUNT(b.order_id) > $3
      |ORDER BY b.order_date DESC
      |LIMIT 100""".stripMargin

  test("QueryHandle round-trip with complex SQL (state_test.rs:3-26)") {
    val handle = QueryHandle(complexSql, Some(Array[Byte](1, 2, 3)))
    val decoded = QueryHandle.decode(handle.encode)
    assert(decoded.query == complexSql)
    assert(decoded.parameters.get.toSeq == Seq[Byte](1, 2, 3))
    assert(decoded.toString == s"Query($complexSql)")
  }

  test("QueryHandle round-trip with empty SQL (state_test.rs:28-37)") {
    val decoded = QueryHandle.decode(QueryHandle("", None).encode)
    assert(decoded.query == "")
    assert(decoded.parameters.isEmpty)
  }

  test("QueryHandle randomized round-trips") {
    val rnd = new Random(42)
    (0 until 200).foreach { _ =>
      val sql = rnd.nextString(rnd.nextInt(300)) // arbitrary unicode
      val params =
        if (rnd.nextBoolean()) Some(Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte))
        else None
      val decoded = QueryHandle.decode(QueryHandle(sql, params).encode)
      assert(decoded.query == sql)
      assert(decoded.parameters.map(_.toSeq) == params.map(_.toSeq))
    }
  }

  test("CommandTicket round-trips every command shape") {
    val commands: Seq[Command] = Seq(
      CommandStatementQuery("SELECT * FROM users"),
      CommandStatementQuery(""),
      CommandPreparedStatementQuery(QueryHandle("SELECT 1", None).encode),
      CommandStatementSubstraitPlan(Array[Byte](9, 9)),
      CommandGetCatalogs(),
      CommandGetDbSchemas(Some("spark_catalog"), Some("def%")),
      CommandGetDbSchemas(None, None),
      CommandGetTables(Some("c"), Some("d%"), Some("t_"), Seq("BASE TABLE", "VIEW"), includeSchema = true),
      CommandGetTables(None, None, None, Nil, includeSchema = false),
      CommandGetTableTypes())
    commands.foreach { cmd =>
      val decoded = CommandTicket.decode(CommandTicket(cmd).encode).command
      (cmd, decoded) match {
        case (a: CommandPreparedStatementQuery, b: CommandPreparedStatementQuery) =>
          assert(a.handle.toSeq == b.handle.toSeq)
        case (a: CommandStatementSubstraitPlan, b: CommandStatementSubstraitPlan) =>
          assert(a.plan.toSeq == b.plan.toSeq)
        case (a, b) => assert(a == b)
      }
    }
  }

  test("ticket randomized round-trip over arbitrary SQL text") {
    val rnd = new Random(7)
    (0 until 200).foreach { _ =>
      val sql = rnd.nextString(rnd.nextInt(500))
      val decoded = CommandTicket.decode(CommandTicket(CommandStatementQuery(sql)).encode)
      assert(decoded.command == CommandStatementQuery(sql))
    }
  }

  test("Any packing uses the Flight SQL type_url prefix") {
    val any = Commands.packAny(CommandStatementQuery("SELECT 1"))
    val url = Proto.decodeFields(any).find(_.tag == 1).map(Proto.string).get
    assert(url == "type.googleapis.com/arrow.flight.protocol.sql.CommandStatementQuery")
  }

  test("varint encoding handles boundary values") {
    val cases = Seq(0L, 1L, 127L, 128L, 300L, Int.MaxValue.toLong,
      Long.MaxValue, -1L, Long.MinValue)
    cases.foreach { n =>
      val w = new Proto.Writer
      w.varintField(3, n)
      val f = Proto.decodeFields(w.result()).head
      assert(f.tag == 3 && f.varint == n, s"failed for $n")
    }
  }

  test("CommandTicket wire layout: command bytes at tag 2 (state.rs:45-49)") {
    val ticket = CommandTicket(CommandStatementQuery("SELECT 1")).encode
    val top = Proto.decodeFields(ticket)
    assert(top.map(_.tag) == Seq(2))
    assert(top.head.wireType == 2)
  }

  test("QueryHandle wire layout: query tag 1 string, parameters tag 2 bytes (state.rs:113-120)") {
    val enc = QueryHandle("SELECT 1", Some(Array[Byte](5))).encode
    val tags = Proto.decodeFields(enc).map(_.tag)
    assert(tags == Seq(1, 2))
  }
}
