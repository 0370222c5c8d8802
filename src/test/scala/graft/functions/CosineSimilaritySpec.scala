package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.TestSpark

/** The native cosine expression: correctness vs the SQL lambda fold it
  * replaces (must be bit-identical — the DuckDB oracle contract), null
  * handling, SQL registration, and codegen path.
  */
class CosineSimilaritySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def vecs(rows: (Long, Seq[Float])*) = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", ArrayType(FloatType), nullable = true)))
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (i, v) =>
        Row(i, if (v == null) null else v)
      }: _*), schema)
  }

  test("matches the SQL aggregate/zip_with fold bit-for-bit") {
    GraftFunctions.register(spark)
    val df = vecs(
      1L -> Seq(0.1f, -0.2f, 0.3f, 0.7f),
      2L -> Seq(0.5f, 0.1f, -0.3f, 0.2f),
      3L -> Seq(1.0f, 2.0f, 3.0f, 4.0f))
    df.createOrReplaceTempView("vecs_test")
    val result = spark.sql(
      """SELECT a.id, b.id,
        |graft_cosine(a.v, b.v) AS native,
        |aggregate(zip_with(a.v, b.v, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) /
        |(SQRT(aggregate(a.v, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) *
        | SQRT(aggregate(b.v, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS lambda
        |FROM vecs_test a JOIN vecs_test b ON a.id < b.id""".stripMargin).collect()
    assert(result.nonEmpty)
    result.foreach { r =>
      assert(r.getDouble(2) == r.getDouble(3),
        s"native ${r.getDouble(2)} != lambda ${r.getDouble(3)}")
    }
  }

  test("identical vectors give 1.0; nulls propagate") {
    GraftFunctions.register(spark)
    vecs(1L -> Seq(0.3f, 0.4f), 2L -> null).createOrReplaceTempView("vecs_null")
    val self = spark.sql("SELECT graft_cosine(v, v) FROM vecs_null WHERE id = 1").collect()
    assert(math.abs(self.head.getDouble(0) - 1.0) < 1e-12)
    val n = spark.sql("SELECT graft_cosine(v, v) FROM vecs_null WHERE id = 2").collect()
    assert(n.head.isNullAt(0))
  }
}
