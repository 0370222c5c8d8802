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

  test("stream-stream interval join restarts from checkpoint with identical results") {
    // The dual-watermark interval join carries BOTH sides' row state in
    // the state store; a restart that loses or replays any of it produces
    // missing or duplicated pairs. Pin: a run killed after batch 1 and
    // resumed over the remaining files must emit exactly the pair multiset
    // of an uninterrupted run of the SAME batch sequence
    // (maxFilesPerTrigger=1 makes the sequences identical). The watermark
    // delay (30 days) exceeds the fixture's whole time range so no state
    // is evicted in either run: restart inserts an extra watermark-commit
    // batch, and with a tight delay that timing difference evicts join
    // state earlier than the control run — legitimate watermark semantics
    // that would mask what this test pins, which is STATE recovery.
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.Trigger

    val events = graft.queries.Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "ts")
    val staged = freshDir("ssj_staged")
    events.repartition(3).write.mode("overwrite").parquet(staged.toString)
    val listing = Files.list(staged)
    val parts =
      try listing.toArray.map(_.asInstanceOf[Path])
        .filter(_.getFileName.toString.endsWith(".parquet")).sortBy(_.toString)
      finally listing.close()
    assert(parts.length == 3)
    val schema = spark.read.parquet(staged.toString).schema

    def runJoin(source: Path, sink: Path, ckpt: Path): Unit = {
      def side(eventType: String, tsName: String) = spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(source.toString)
        .filter(org.apache.spark.sql.functions.col("event_type") === eventType)
        .selectExpr("user_id", s"CAST(ts AS TIMESTAMP) AS $tsName",
          s"event_id AS ${tsName}_id")
        .withWatermark(tsName, "30 days")
      val joined: DataFrame = side("click", "click_ts")
        .withColumnRenamed("user_id", "c_user")
        .join(side("purchase", "p_ts"),
          org.apache.spark.sql.functions.col("c_user") ===
            org.apache.spark.sql.functions.col("user_id") &&
            org.apache.spark.sql.functions.col("p_ts") >=
              org.apache.spark.sql.functions.col("click_ts") &&
            org.apache.spark.sql.functions.col("p_ts") <=
              org.apache.spark.sql.functions.col("click_ts") +
                org.apache.spark.sql.functions.expr("INTERVAL 1 HOUR"))
        .select("c_user", "click_ts_id", "p_ts_id")
      val q = joined.writeStream
        .format("parquet")
        .option("path", sink.toString)
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally { if (q.isActive) q.stop() }
    }

    def copyIn(dest: Path, ps: Seq[Path]): Unit =
      ps.foreach(p => Files.copy(p, dest.resolve(p.getFileName),
        StandardCopyOption.REPLACE_EXISTING))

    val prevWidth = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val (srcA, sinkA, ckptA) = (freshDir("ssj_srcA"), freshDir("ssj_sinkA"), freshDir("ssj_ckptA"))
    val (srcB, sinkB, ckptB) = (freshDir("ssj_srcB"), freshDir("ssj_sinkB"), freshDir("ssj_ckptB"))
    try {
      // control: uninterrupted run over all three files
      copyIn(srcA, parts)
      runJoin(srcA, sinkA, ckptA)
      // restart run: batch 1, kill, drop in the rest, resume same checkpoint
      copyIn(srcB, parts.take(1))
      runJoin(srcB, sinkB, ckptB)
      copyIn(srcB, parts.drop(1))
      runJoin(srcB, sinkB, ckptB)

      def pairs(sink: Path): Seq[(Long, Long, Long)] =
        spark.read.parquet(sink.toString)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .toSeq.sorted
      val control = pairs(sinkA)
      val restarted = pairs(sinkB)
      assert(control.nonEmpty, "fixture must produce click->purchase pairs")
      assert(restarted == control,
        "restart must neither lose nor duplicate any joined pair")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevWidth)

    for (dir <- Seq(staged, srcA, sinkA, ckptA, srcB, sinkB, ckptB)) {
      val walk = Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => { Files.deleteIfExists(p); () })
      finally walk.close()
    }
  }

  test("left-outer join's unmatched state survives a checkpoint restart") {
    // The outer join's null-padded rows emit from STATE, possibly many
    // batches (and one process lifetime) after the click arrived. Pin: a
    // run killed BEFORE the watermark closes any click, then resumed over
    // the remaining files + the far-future sentinels, must emit exactly
    // the matched+unmatched multiset of an uninterrupted run of the same
    // file sequence — a restart that drops outer state loses unmatched
    // rows; one that replays it duplicates them. (Unlike the inner-join
    // pin above, the watermark here is the production 1 h: eviction and
    // emission are the subject, and the checkpoint persists the watermark
    // so both runs walk the same trajectory per data batch.)
    import org.apache.spark.sql.streaming.Trigger
    val events = graft.queries.Tables.events(spark, sf)
      .select("user_id", "event_type", "ts")
    val staged = freshDir("lo_staged")
    events.repartition(2).write.mode("overwrite").parquet(staged.toString)
    // two sentinel files, each carrying BOTH event types (user -1) so both
    // sides' watermarks pass every real row — same technique as
    // EventStream.stageOuter
    for (far <- Seq("2099-01-01 00:00:00", "2099-06-01 00:00:00")) {
      spark.read.parquet(staged.toString).limit(1)
        .withColumn("event_type",
          org.apache.spark.sql.functions.explode(org.apache.spark.sql.functions.array(
            org.apache.spark.sql.functions.lit("click"),
            org.apache.spark.sql.functions.lit("purchase"))))
        .withColumn("user_id", org.apache.spark.sql.functions.lit(-1L))
        .withColumn("ts", org.apache.spark.sql.functions.expr(s"timestamp_ntz '$far'"))
        .select("user_id", "event_type", "ts")
        .coalesce(1).write.mode("append").parquet(staged.toString)
    }
    val listing = Files.list(staged)
    val parts =
      try listing.toArray.map(_.asInstanceOf[Path])
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .sortBy(p => Files.getLastModifiedTime(p).toMillis -> p.toString)
      finally listing.close()
    assert(parts.length == 4, s"2 data + 2 sentinel files, got ${parts.length}")
    val schema = spark.read.parquet(staged.toString).schema

    def runOuter(source: Path, sink: Path, ckpt: Path): Unit = {
      import org.apache.spark.sql.functions._
      def side(eventType: String, userName: String, tsName: String) = spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(source.toString)
        .filter(col("event_type") === eventType)
        .select(col("user_id").as(userName), col("ts").cast("timestamp").as(tsName))
        .withWatermark(tsName, "1 hour")
      val joined = side("click", "user_id", "click_ts")
        .join(side("purchase", "p_user", "p_ts"),
          col("user_id") === col("p_user") &&
            col("p_ts") >= col("click_ts") &&
            col("p_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"),
          "leftOuter")
        .select(col("user_id"), col("click_ts"), col("p_ts"))
      val q = joined.writeStream
        .format("parquet")
        .option("path", sink.toString)
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally { if (q.isActive) q.stop() }
    }
    def copyIn(dest: Path, ps: Seq[Path]): Unit =
      ps.foreach { p =>
        val dst = Files.copy(p, dest.resolve(p.getFileName),
          StandardCopyOption.REPLACE_EXISTING)
        // FileStreamSource orders by mtime and sub-ms copies tie — stamp
        // each file with its global sequence so the sentinels are
        // guaranteed to process AFTER every real-data file, identically
        // in the control and restart runs
        Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(
            1_000_000_000_000L + parts.indexOf(p).toLong * 60_000L))
        ()
      }
    def rows(sink: Path): Seq[(Long, String, String)] =
      spark.read.parquet(sink.toString).filter("user_id >= 0")
        .collect().map(r => (r.getLong(0), String.valueOf(r.get(1)), String.valueOf(r.get(2))))
        .toSeq.sorted

    val prevWidth = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val (srcA, sinkA, ckptA) = (freshDir("lo_srcA"), freshDir("lo_sinkA"), freshDir("lo_ckptA"))
    val (srcB, sinkB, ckptB) = (freshDir("lo_srcB"), freshDir("lo_sinkB"), freshDir("lo_ckptB"))
    try {
      copyIn(srcA, parts)
      runOuter(srcA, sinkA, ckptA) // control: uninterrupted
      copyIn(srcB, parts.take(2)) // all real data, NO sentinels: nothing evicts yet
      runOuter(srcB, sinkB, ckptB)
      copyIn(srcB, parts.drop(2)) // sentinels arrive in the SECOND incarnation
      runOuter(srcB, sinkB, ckptB)
      val control = rows(sinkA)
      val restarted = rows(sinkB)
      assert(control.exists(_._3 == "null"), "control must contain unmatched (null-padded) clicks")
      assert(restarted == control,
        "restart must neither lose nor duplicate matched or unmatched rows")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevWidth)

    for (dir <- Seq(staged, srcA, sinkA, ckptA, srcB, sinkB, ckptB)) {
      val walk = Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => { Files.deleteIfExists(p); () })
      finally walk.close()
    }
  }

  test("left-outer stream join emits unmatched clicks only at watermark close") {
    // The oracle gate proves value equality with the batch left join; this
    // pin proves the OUTER semantics are actually exercised — the fixture
    // must contain clicks with no purchase inside the hour, and those must
    // surface as null-padded rows (n_unmatched > 0) rather than the join
    // silently degenerating to its inner form.
    val got = EventStream.leftOuterJoinCounts(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.values.map(_._3).sum > 0, "fixture must produce unmatched clicks")
    assert(got.values.map(_._2).sum > 0, "fixture must produce matched pairs")
    // batch closed form over the same events
    import org.apache.spark.sql.functions._
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"), col("event_type"))
    val c = ev.filter(col("event_type") === "click").select(col("user_id"), col("ts").as("cts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("pts"))
    val batch = c.join(p,
        col("user_id") === col("p_user") &&
          col("pts") >= col("cts") && col("pts") <= col("cts") + expr("INTERVAL 1 HOUR"),
        "leftOuter")
      .groupBy("user_id").agg(
        count(lit(1)).as("n_rows"),
        count(col("pts")).as("n_matched"),
        (count(lit(1)) - count(col("pts"))).as("n_unmatched"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == batch, "streamed left-outer rollup must equal the batch left join")
  }

  test("full-outer stream join accounts every event exactly once across the three outcomes") {
    // The oracle gate proves batch equality; this pin proves BOTH outer
    // sides are genuinely exercised (click-only AND purchase-only rows
    // surface) and the partition is exact: n_rows = matched + click_only
    // + purchase_only per user, and the totals reconcile against the raw
    // event counts (every unmatched purchase appears exactly once).
    val got = EventStream.fullOuterJoinCounts(spark, sf).collect()
    assert(got.nonEmpty)
    for (r <- got)
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4),
        s"row partition broken for uid ${r.getLong(0)}: $r")
    assert(got.map(_.getLong(3)).sum > 0, "fixture must produce click-only rows")
    assert(got.map(_.getLong(4)).sum > 0, "fixture must produce purchase-only rows")
    // purchase accounting: matched pair rows + purchase-only rows count
    // every purchase AT LEAST once (a purchase can match several clicks);
    // purchase-only rows can never exceed the raw purchase count
    import org.apache.spark.sql.functions._
    val ev = graft.queries.Tables.events(spark, sf)
    val nPurchases = ev.filter(col("event_type") === "purchase").count()
    assert(got.map(_.getLong(4)).sum <= nPurchases)
  }

  test("state-store release defers to an active stream on a SIBLING session") {
    import org.apache.spark.sql.execution.streaming.state.StateStore
    // StateStore.stop() is JVM-global but spark.streams is per-session: a
    // release decided only from the CALLING session's manager would evict
    // a sibling session's loaded providers mid-run and silently kill its
    // maintenance task (the multi-tenant newSession() scenario). Pin the
    // guard end-to-end: a long-lived stateful stream on a sibling session
    // must survive another session's release; once it stops, the release
    // proceeds.
    val sibling = spark.newSession()
    val staged = freshDir("guard_src")
    spark.range(100).selectExpr("id % 10 AS k", "id AS v")
      .write.mode("overwrite").parquet(staged.toString)
    val schema = spark.read.parquet(staged.toString).schema
    val name = s"guard_sink_${System.nanoTime()}"
    val q = sibling.readStream.schema(schema).parquet(staged.toString)
      .groupBy("k").count()
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .start() // default trigger: stays ACTIVE after draining
    try {
      q.processAllAvailable() // stateful batch ran -> providers + maintenance live
      assert(StateStore.isMaintenanceRunning,
        "sibling's stateful stream must have loaded providers")
      EventStream.releaseStateStores(spark) // the MAIN session sees no active streams
      assert(StateStore.isMaintenanceRunning,
        "release must not stop the JVM-global state store under a sibling-session stream")
    } finally {
      q.stop()
      sibling.catalog.dropTempView(name)
    }
    EventStream.releaseStateStores(spark) // all quiet now -> really releases
    assert(!StateStore.isMaintenanceRunning,
      "with no active stream anywhere, the release must unload providers")
    val walk = Files.walk(staged)
    try walk.sorted(java.util.Comparator.reverseOrder[Path]())
      .forEach(p => { Files.deleteIfExists(p); () })
    finally walk.close()
  }

  test("dropDuplicatesWithinWatermark evicts key state at the watermark and re-admits the key") {
    // The semantics that distinguish it from dropDuplicates: a key's
    // state expires at first-seen event time + delay, so a duplicate
    // arriving AFTER the watermark passes that expiry is re-emitted —
    // bounded state on an unbounded stream, bought with exactly this
    // re-admission. Controlled micro-batches make the boundary
    // deterministic: watermark updates between batches from the previous
    // batch's max event time.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val name = s"ddww_sink_${System.nanoTime()}"
    val q = in.toDF().toDF("k", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("k")
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    try {
      in.addData((1L, ts(600))); q.processAllAvailable()  // first seen: emitted; expiry 610
      in.addData((1L, ts(605))); q.processAllAvailable()  // dup inside the window: suppressed
      in.addData((2L, ts(700))); q.processAllAvailable()  // watermark -> 690 > 610: key 1 evicted
      in.addData((1L, ts(701))); q.processAllAvailable()  // re-admitted: emitted AGAIN
      val perKey = spark.table(name).groupBy("k").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(perKey(1L) == 2,
        "key 1 must emit twice: once per watermark-separated epoch (dropDuplicates would emit once)")
      assert(perKey(2L) == 1)
    } finally {
      q.stop()
      spark.catalog.dropTempView(name)
      EventStream.releaseStateStores(spark)
    }
  }

  test("quantile sketch is invariant to micro-batch chopping and equals the batch closed form") {
    val chopped = freshDir("qsketch").resolve("events").toString
    graft.queries.Tables.events(spark, sf).repartition(3)
      .write.mode("overwrite").parquet(chopped)
    assert(new java.io.File(chopped).listFiles().count(_.getName.startsWith("part-")) == 3)
    // 3 files x maxFilesPerTrigger=1 => 3 micro-batches through the state
    val choppedOut = EventStream
      .quantileSketchFrom(spark, chopped, Map("maxFilesPerTrigger" -> "1"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    val oneShot = EventStream.quantileSketchCounts(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(choppedOut.toSeq == oneShot.toSeq,
      "micro-batch chopping changed the sketch")
    // batch closed form inside Spark (independent of the DuckDB oracle);
    // own view name: the shared session's `events` may be shadowed by a
    // service-replay suite's in-memory view
    graft.queries.Tables.events(spark, sf).createOrReplaceTempView("qsketch_events")
    val batch = spark.sql(
      """WITH e AS (SELECT event_type,
        |                 LEAST(63, GREATEST(0, CAST(FLOOR(FLOOR(value * 100 + 0.5) / 800) AS BIGINT))) AS b
        |          FROM qsketch_events),
        |h AS (SELECT event_type, b, COUNT(*) AS c FROM e GROUP BY event_type, b),
        |cum AS (SELECT event_type, b,
        |               SUM(c) OVER (PARTITION BY event_type ORDER BY b) AS cum,
        |               SUM(c) OVER (PARTITION BY event_type) AS n
        |        FROM h)
        |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
        |       CAST(MIN(CASE WHEN cum * 100 >= 50 * n THEN b END) AS INT) AS p50_b,
        |       CAST(MIN(CASE WHEN cum * 100 >= 90 * n THEN b END) AS INT) AS p90_b,
        |       CAST(MIN(CASE WHEN cum * 100 >= 99 * n THEN b END) AS INT) AS p99_b
        |FROM cum GROUP BY event_type ORDER BY event_type""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(oneShot.toSeq == batch.toSeq)
  }

  test("media dedup ingest is micro-batch-chop invariant (admitted SET, not keepers)") {
    val sf = "/root/testdata/sf0.001"
    val chopped = CorpusIngest.mediaDedupIngest(spark.newSession(), sf, "1")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val oneShot = CorpusIngest.mediaDedupIngest(spark.newSession(), sf, "2")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(chopped.toSeq == oneShot.toSeq,
      s"unique-fingerprint counts depend on micro-batch chopping: ${chopped.toSeq} vs ${oneShot.toSeq}")
    assert(chopped.nonEmpty && chopped.map(_._3).sum > 0)
  }
}
