package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The config-driven extension surface: a session built with
  * `spark.sql.extensions=graft.plans.GraftSparkSessionExtension` has the
  * graft functions without any imperative registration, and the
  * canonicalization rule rewrites commutative cosine calls.
  */
class ExtensionSpec extends AnyFunSuite {

  private def withExtensionSession[A](f: SparkSession => A): A = {
    val prev = TestSpark.spark // ensures a SparkContext exists to share
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions is the programmatic form of
      // spark.sql.extensions=graft.plans.GraftSparkSessionExtension (the
      // config form only applies to a fresh SparkContext, which a shared
      // test JVM can't create)
      val s = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftSparkSessionExtension)
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
      f(s)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("spark.sql.extensions injects graft functions at session build") {
    withExtensionSession { s =>
      import s.implicits._
      Seq((Seq(1f, 2f), Seq(2f, 4f))).toDF("a", "b").createOrReplaceTempView("v")
      val row = s.sql(
        """SELECT graft_cosine(a, b) AS c, graft_dot(a, array(1.0D, 1.0D)) AS d,
          |graft_dot_d(array(2.0D, 3.0D), array(4.0D, 5.0D)) AS dd,
          |graft_overlap(array('x', 'y'), array('y', 'z')) AS ov FROM v""".stripMargin)
        .collect().head
      assert(math.abs(row.getDouble(0) - 1.0) < 1e-12) // parallel vectors
      assert(row.getDouble(1) == 3.0)
      assert(row.getDouble(2) == 23.0)
      assert(row.getInt(3) == 1)
    }
  }

  test("optimizer canonicalizes commutative cosine argument order") {
    withExtensionSession { s =>
      // parquet-backed (a LocalRelation would be eagerly evaluated by
      // ConvertToLocalRelation, leaving no expression to inspect)
      s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .selectExpr("embedding AS a", "embedding AS b")
        .createOrReplaceTempView("v2")
      val optimized = s.sql("SELECT graft_cosine(b, a) AS c FROM v2")
        .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.optimizedPlan
      val cos = optimized.expressions.flatMap(_.collect {
        case c: org.apache.spark.sql.graftbridge.CosineSimilarity => c
      }).head
      assert(cos.left.sql <= cos.right.sql,
        s"arguments must be canonically ordered, got ${cos.sql}")
      // and the swapped call computes the identical value
      val v = s.sql("SELECT graft_cosine(b, a) AS c FROM v2").collect().head.getDouble(0)
      val v2 = s.sql("SELECT graft_cosine(a, b) AS c FROM v2").collect().head.getDouble(0)
      assert(v == v2)
    }
  }
}
