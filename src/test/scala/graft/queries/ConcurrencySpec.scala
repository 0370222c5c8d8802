package graft.queries

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.TestSpark

/** A long-running server executes queries for many sessions at once; the
  * operators that memoize shared intermediates (MinHash pair cache, corpus
  * index, staged streaming fixtures, bucketed tables) must stay correct
  * under that concurrency — computeIfAbsent races, staging overwrites, or
  * per-session catalog leaks would show up as cross-thread result drift.
  */
class ConcurrencySpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  test("cache-backed queries return identical results from concurrent sessions") {
    val root = TestSpark.spark
    val queries = Seq(
      "q_dedup_minhash",     // shared pair-pipeline memo
      "q_dedup_incremental", // shared corpus index
      "q_stream_dedup_corpus", // staged ingest fixture + corpus index
      "q_agg_winsorize",     // plain compute (control)
      "q_src_bucketed_join") // global bucketed-fixture guard
    val pool = Executors.newFixedThreadPool(queries.size * 2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      // two independent sessions per query, all in flight together
      val futures = for {
        q <- queries
        i <- 0 until 2
      } yield Future {
        val s = root.newSession()
        val rows = SparkEntry.queries(q)(s, sf).collect()
        (q, i, rows.length, rows.map(_.toString).toSeq.sorted.hashCode())
      }
      val results = Await.result(Future.sequence(futures), 5.minutes)
      for (q <- queries) {
        val per = results.filter(_._1 == q)
        assert(per.map(_._3).distinct.size == 1,
          s"$q row counts diverged across concurrent sessions: ${per.map(_._3)}")
        assert(per.map(_._4).distinct.size == 1,
          s"$q row contents diverged across concurrent sessions")
      }
    } finally pool.shutdown()
  }
}
