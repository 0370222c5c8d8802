package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Checkpoint-restart recovery: the operational contract of a long-running
  * ingest stream. A production pipeline WILL be restarted (deploy, crash,
  * rebalance) and the invariant is exactly-once delivery to the sink —
  * nothing reprocessed, nothing lost — carried by the checkpoint's file
  * source log + commit log. The replay: run a file-source stream to
  * completion on batch 1, stop the query, drop two more files into the
  * source, restart the SAME query from the SAME checkpoint, and assert
  * the sink holds every input row exactly once.
  */
class StreamRecoverySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def freshDir(tag: String): Path = {
    val p = Paths.get(s"target/fixtures/recovery_${tag}_${System.nanoTime()}")
    Files.createDirectories(p)
    p
  }

  test("file-source stream resumes from checkpoint without duplicating or losing rows") {
    val events = graft.queries.Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "value")
    val staged = freshDir("staged")
    events.repartition(3).write.mode("overwrite").parquet(staged.toString)
    val listing = Files.list(staged)
    val parts =
      try listing.toArray.map(_.asInstanceOf[Path])
        .filter(_.getFileName.toString.endsWith(".parquet")).sortBy(_.toString)
      finally listing.close()
    assert(parts.length == 3, s"expected 3 staged files, got ${parts.length}")

    val source = freshDir("source")
    val sink = freshDir("sink")
    val ckpt = freshDir("ckpt")
    val schema = spark.read.parquet(staged.toString).schema

    def copyIn(p: Path): Unit =
      Files.copy(p, source.resolve(p.getFileName), StandardCopyOption.REPLACE_EXISTING)

    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(source.toString)
        .withColumn("vx", col("value") * 2)
        .writeStream
        .format("parquet")
        .option("path", sink.toString)
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    copyIn(parts(0))
    runOnce() // first incarnation: processes file 1, commits, terminates

    copyIn(parts(1))
    copyIn(parts(2))
    runOnce() // restart from checkpoint: must pick up ONLY files 2 and 3

    val got = spark.read.parquet(sink.toString)
    val expected = spark.read.parquet(staged.toString).count()
    assert(got.count() == expected, "every input row lands in the sink exactly once")
    assert(got.select("event_id").distinct().count() == expected,
      "no event is duplicated across the restart")

    // tidy the nanoTime-named fixture dirs (they'd otherwise accumulate
    // across runs); only on success so a failure leaves evidence behind
    for (dir <- Seq(staged, source, sink, ckpt)) {
      val walk = Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => { Files.deleteIfExists(p); () })
      finally walk.close()
    }
  }
}
