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
}
