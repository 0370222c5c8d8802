package graft

import org.scalatest.funsuite.AnyFunSuite

/** Local pin for the driver's smoke contract: `SparkEntry.entry` must
  * return rows on the sf0.001 fixture (the driver only checks rows > 0;
  * failing here beats failing at the round gate).
  */
class EntrySpec extends AnyFunSuite {

  test("flagship entry() returns grouped revenue rows on sf0.001") {
    val rows = SparkEntry.entry(TestSpark.spark).collect()
    assert(rows.nonEmpty, "driver smoke contract: rows > 0")
    // one row per order priority, revenue positive, priorities sorted
    val prios = rows.map(_.getString(0)).toSeq
    assert(prios == prios.sorted, "ORDER BY o_orderpriority")
    assert(rows.forall(_.getDouble(2) > 0), "aggregated revenue must be positive")
  }
}
