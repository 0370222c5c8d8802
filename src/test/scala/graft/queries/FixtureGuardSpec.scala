package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Regression pin for the shared-fixture guards: bucketed tables and their
  * paths are shared across sessions (SharedState catalog), so the rebuild
  * guard must be global — a per-session guard let one session's rebuild
  * silently serve another session stale data (round-3 review finding).
  */
class FixtureGuardSpec extends AnyFunSuite {

  test("bucketed fixture guard detects cross-session dir switches") {
    val s = TestSpark.spark
    val d1 = "/root/testdata/sf0.001"
    val d2 = "/root/testdata/sf0.01"

    ExtraQueries.ensureBucketed(s, d1)
    val n1 = s.table("b_orders").count()

    // a different session switches the shared tables to another dir
    // (each session reads only after ITS ensure — the production contract,
    // since DSv1 relation caches are per-session)
    val s2 = s.newSession()
    ExtraQueries.ensureBucketed(s2, d2)
    val n2 = s2.table("b_orders").count()
    assert(n2 != n1, "precondition: the two dirs must differ in row count")

    // the first session's next ensure must notice the switch and rebuild
    // for ITS dir instead of trusting a stale per-session guard
    ExtraQueries.ensureBucketed(s, d1)
    assert(s.table("b_orders").count() === n1)
  }

  test("q_embed_ood_diag integer form stays inside BIGINT at the shipped fixture sizes") {
    // Round-8 advice: (n·x − s1)²·1000 overflows BIGINT once the
    // reference set reaches ~5e4 vectors; Spark wraps silently while
    // DuckDB raises. The query documents the bound — this canary makes a
    // fixture regen past it fail LOUDLY here instead of shipping
    // divergent results. Bound: |n·x − s1| <= 2·n·maxAbsXi, and the
    // squared term × 1000 must stay under 2^63.
    val s = TestSpark.spark
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                   "/root/testdata/sf0.1")) {
      val ref = Tables.embeddings(s, sf)
        .selectExpr("vec_id",
          "aggregate(transform(embedding, e -> abs(CAST(FLOOR(CAST(e AS DOUBLE) * 1000 + 0.5) AS BIGINT))), CAST(0 AS BIGINT), (a, x) -> GREATEST(a, x)) AS mx")
        .where("vec_id % 7 != 0")
        .agg(org.apache.spark.sql.functions.expr("COUNT(*) AS n"),
             org.apache.spark.sql.functions.expr("MAX(mx) AS mx"))
        .head()
      val n = ref.getLong(0)
      val mx = ref.getLong(1)
      val worst = BigInt(2) * BigInt(n) * BigInt(mx)
      assert(worst * worst * 1000 < BigInt(Long.MaxValue),
        s"$sf: q_embed_ood_diag integer domain would overflow " +
          s"(n=$n, maxAbsXi=$mx) — rescale the query before regenerating fixtures")
    }
  }
}
