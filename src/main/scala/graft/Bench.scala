package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark main. Times every SparkEntry query at SPARK_GRAFT_SF_DIR with a
  * fully materializing action (noop-format write — nothing survives to be
  * optimized away, unlike count() which let Catalyst eliminate sorts and
  * projections), after an untimed warm-up pass that pays JIT/codegen/footer
  * costs once.
  *
  * Output: ONE JSON line on stdout AND in ./bench_out.json. Failures are
  * recorded per-query (`null` timing + name in `errors`) and exit nonzero —
  * a broken query can never read as a fast query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // Warm-up (untimed): a scan+join+agg+sort covers the codegen paths the
    // matrix reuses; round-1 showed the first query absorbing ~4s of JIT.
    Seq("q_agg_q1", "q_join_inner", "q_scan_project")
      .filter(SparkEntry.queries.contains)
      .foreach(n => try materialize(n) catch { case _: Throwable => () })

    var failures = List.empty[String]
    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val t0 = System.nanoTime()
      val ok =
        try { materialize(name); true }
        catch {
          case e: Throwable =>
            failures ::= s"$name: ${e.getClass.getName}: ${String.valueOf(e.getMessage).take(300)}"
            false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }

    val qs = results
      .map { case (k, v, ok) => s""""$k":${if (ok) f"$v%.3f" else "null"}""" }
      .mkString("{", ",", "}")
    val errs = results.filterNot(_._3).map(r => "\"" + r._1 + "\"").mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    val note = "r2 re-baseline: materializing noop-write action + warm-up " +
      "(r1 used count(), which let Catalyst drop sorts/projections) over the " +
      "full 90-query matrix (r1: 33 queries)"
    val json =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir","cpus":$cpus,"n_ok":${results.count(_._3)},"n":${results.size},"note":"$note"}"""
    println(json)
    Files.writeString(Paths.get("bench_out.json"), json + "\n")
    failures.foreach(f => System.err.println(s"[bench] FAIL $f"))
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
