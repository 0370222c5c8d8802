package graft.substrait

import java.nio.file.{Files, Paths}

/** Dumps the exact plan bytes the inventory queries execute
  * (`q_substrait_exec`, `q_substrait_join`, `q_substrait_union`) so an
  * independent consumer can run them: `scripts/check_substrait.py` feeds
  * these files to Acero (pyarrow.substrait.run_query) and compares with
  * DuckDB on the same parquet tables. No SparkSession — the builder is
  * pure bytes.
  *
  * Usage: sbt "runMain graft.substrait.SubstraitPlanDump <outDir>"
  */
object SubstraitPlanDump {
  def main(args: Array[String]): Unit = {
    val out = Paths.get(if (args.nonEmpty) args(0) else "target/substrait-plans")
    Files.createDirectories(out)
    Files.write(out.resolve("q_substrait_exec.plan"), SubstraitQueries.aggPlanBytes)
    Files.write(out.resolve("q_substrait_join.plan"), SubstraitQueries.joinPlanBytes)
    Files.write(out.resolve("q_substrait_union.plan"), SubstraitQueries.unionPlanBytes)
    Files.write(out.resolve("q_substrait_window.plan"), SubstraitQueries.windowPlanBytes)
    Files.write(out.resolve("q_substrait_grouping_sets.plan"), SubstraitQueries.groupingSetsPlanBytes)
    Files.write(out.resolve("q_substrait_in_subquery.plan"), SubstraitQueries.inSubqueryPlanBytes)
    println(s"wrote 6 plans to $out")
  }
}
