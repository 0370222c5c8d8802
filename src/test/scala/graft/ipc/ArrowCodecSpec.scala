package graft.ipc

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.TestSpark

/** Arrow IPC data-plane round-trips (SURVEY §2.A A4/A24): every fixture
  * type crosses the encode/decode boundary; schema messages round-trip
  * standalone; encoding is framed (schema frame + batch frames + EOS).
  */
class ArrowCodecSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("all fixture column types round-trip through the IPC stream") {
    val schema = StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("l", LongType, nullable = true),
      StructField("d", DoubleType, nullable = true),
      StructField("f", FloatType, nullable = true),
      StructField("s", StringType, nullable = true),
      StructField("b", BooleanType, nullable = true),
      StructField("bin", BinaryType, nullable = true),
      StructField("arr", ArrayType(FloatType), nullable = true)))
    val rows = java.util.Arrays.asList(
      Row(1, 2L, 3.5, 4.5f, "hello", true, Array[Byte](1, 2), Seq(0.1f, 0.2f)),
      Row(2, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(rows, schema)
    val decoded = ArrowCodec.decode(ArrowCodec.encodeStream(df).toBytes)
    assert(decoded.schema.getFields.size == 8)
    assert(decoded.rows.size == 2)
    val r0 = decoded.rows.find(_.head == 1).get
    assert(r0(1) == 2L && r0(2) == 3.5 && r0(3) == 4.5f && r0(4) == "hello" && r0(5) == true)
    assert(r0(6).asInstanceOf[Array[Byte]].toSeq == Seq[Byte](1, 2))
    assert(r0(7) == Seq(0.1f, 0.2f))
    val r1 = decoded.rows.find(_.head == 2).get
    assert(r1.tail.forall(_ == null))
  }

  test("multi-batch streaming: frames arrive incrementally, concatenation decodes") {
    import spark.implicits._
    val df = spark.range(0, 10000).select($"id")
    val stream = ArrowCodec.encodeStream(df, batchSize = 1024)
    val frames = stream.frames.toSeq
    assert(frames.size >= 3) // schema + several batches + EOS
    val decoded = ArrowCodec.decode(frames.reduce(_ ++ _))
    assert(decoded.rows.size == 10000)
    assert(decoded.rows.map(_.head.asInstanceOf[Long]).sum == (0L until 10000L).sum)
  }

  test("schema message round-trips standalone (encode_schema/decode_schema, A24)") {
    val schema = org.apache.spark.sql.graftbridge.SparkArrowBridge.toArrowSchema(
      StructType(Seq(
        StructField("id", IntegerType, nullable = false),
        StructField("name", StringType, nullable = false))), "UTC")
    val decoded = ArrowCodec.decodeSchema(ArrowCodec.encodeSchema(schema))
    assert(decoded == schema)
  }

  test("field metadata attaches positionally and survives the schema codec") {
    val schema = org.apache.spark.sql.graftbridge.SparkArrowBridge.toArrowSchema(
      StructType(Seq(StructField("id", IntegerType, nullable = false))), "UTC")
    val decorated = ArrowCodec.withFieldMetadata(schema, Seq(Map("table_name" -> "users")))
    val decoded = ArrowCodec.decodeSchema(ArrowCodec.encodeSchema(decorated))
    assert(decoded.getFields.get(0).getMetadata.get("table_name") == "users")
  }

  test("abandoned/failed streams release Arrow buffers (close is idempotent)") {
    // Execution error mid-stream: the iterator's own catch must close the
    // RootAllocator (allocator.close() throws if buffers leak, so a leak
    // fails this test), and the transport's finally-close must be a no-op.
    val failing = spark.sql("SELECT raise_error('boom') AS x FROM range(10)")
    val stream = ArrowCodec.encodeStream(failing)
    intercept[Throwable] { stream.frames.foreach(_ => ()) }
    stream.close() // already closed by the error path — must not throw
    stream.close() // idempotent

    // Abandonment without error: client disconnects after the first frame.
    val ok = spark.range(5).toDF("id")
    val abandoned = ArrowCodec.encodeStream(ok)
    abandoned.frames.next() // schema frame only, batches never pulled
    abandoned.close() // must release root + allocator without throwing
    abandoned.close()

    // Natural completion: close after EOS is a no-op.
    val complete = ArrowCodec.encodeStream(ok)
    complete.toBytes
    complete.close()
  }

  test("junk bytes fail decode cleanly and release their allocator (no leak, no hang)") {
    // The federation client (RemoteSqlClient) decodes peer-supplied bytes;
    // corrupt input must throw without leaking direct memory. Seeded junk
    // plus a truncated VALID stream (headers ok, cut mid-body).
    val rng = new scala.util.Random(43)
    val valid = ArrowCodec.encodeStream(spark.range(100).toDF("id")).toBytes
    val cases = Seq.fill(15)(Array.fill(1 + rng.nextInt(200))(rng.nextInt(256).toByte)) :+
      valid.take(valid.length / 2)
    for (junk <- cases) {
      try { ArrowCodec.decode(junk); () }
      catch { case _: Exception => () } // any Exception is fine; an OOM/hang is not
    }
    // allocator health: a full valid round-trip still works after the junk
    assert(ArrowCodec.decode(valid).rows.size == 100)
  }

  test("timestamp columns round-trip (µs precision)") {
    val schema = StructType(Seq(
      StructField("ts", TimestampNTZType, nullable = false)))
    val t = java.time.LocalDateTime.of(2024, 1, 1, 12, 34, 56, 789000000)
    val df = spark.createDataFrame(java.util.Arrays.asList(Row(t)), schema)
    val decoded = ArrowCodec.decode(ArrowCodec.encodeStream(df).toBytes)
    assert(decoded.rows.head.head == t)
  }
}
