package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{QuerySpec, Tables}

/** Structured Streaming over the events table (SURVEY §2.B.10 extension:
  * the reference's only streaming is incremental result delivery; this is
  * the Spark-native stream-processing path for the same data).
  *
  * The batch parquet fixture is replayed as a file stream; the windowed
  * aggregation (1-hour tumbling windows per event_type, with a watermark
  * for state cleanup at scale) runs through the streaming engine and
  * drains into a memory sink. At 100 TB/day this exact plan runs
  * unchanged against a Kafka/file source — tumbling windows shuffle once
  * on (window, event_type), and the watermark bounds state.
  */
object EventStream {

  /** The streaming results equal the batch aggregations — which is exactly
    * what the DuckDB oracles compute.
    */
  val specs: Map[String, QuerySpec] = Map(
    "q_stream_window" -> QuerySpec.df(
      (s, d) => windowedCounts(s, d),
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws, event_type, COUNT(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin),

    // Sliding windows: every event lands in w/s = 2 windows; the oracle
    // reproduces that with an explicit 2-offset expansion.
    "q_stream_sliding" -> QuerySpec.df(
      (s, d) => slidingCounts(s, d),
      """SELECT ws, event_type, COUNT(*) AS n FROM (
        |  SELECT CAST(date_trunc('hour', ts) - k * INTERVAL 1 HOUR AS TIMESTAMP) AS ws, event_type
        |  FROM events CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS k) ks) t
        |GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin),

    // Custom state: per-user running totals via mapGroupsWithState; the
    // final state equals the batch per-user count.
    "q_stream_stateful" -> QuerySpec.df(
      (s, d) => statefulCounts(s, d),
      """SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
        |ORDER BY user_id""".stripMargin))

  /** Stage the µs-normalized events once per (session, dir) — the raw
    * fixture is ns-precision parquet which Spark can't stream directly.
    */
  private def stage(spark: SparkSession, dir: String): String = {
    val staged = "/root/repo/target/fixtures/events_us.parquet"
    Tables.events(spark, dir).write.mode("overwrite").parquet(staged)
    staged
  }

  private def runToTable(stream: DataFrame, mode: String): DataFrame = {
    val spark = stream.sparkSession
    val queryName = s"graft_event_stream_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val query = stream.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(queryName)
      .start()
    try query.processAllAvailable()
    finally query.stop()
    spark.table(queryName)
  }

  /** Replay events as a stream → tumbling-window counts. Returns the final
    * (batch-equivalent) result so correctness is oracle-checkable.
    */
  def windowedCounts(spark: SparkSession, dir: String): DataFrame = {
    val staged = stage(spark, dir)
    val schema = spark.read.parquet(staged).schema
    val stream = spark.readStream
      .schema(schema)
      .parquet(staged)
      // watermarks require an instant (TIMESTAMP); session tz is UTC so the
      // NTZ wall-clock maps 1:1 and the window starts cast back losslessly
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    runToTable(stream, "complete")
      .select(col("window.start").cast("timestamp_ntz").as("ws"),
        col("event_type"), col("n"))
      .orderBy("ws", "event_type")
  }

  /** Sliding windows (2h width, 1h slide). */
  def slidingCounts(spark: SparkSession, dir: String): DataFrame = {
    val staged = stage(spark, dir)
    val schema = spark.read.parquet(staged).schema
    val stream = spark.readStream
      .schema(schema)
      .parquet(staged)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    runToTable(stream, "complete")
      .select(col("window.start").cast("timestamp_ntz").as("ws"),
        col("event_type"), col("n"))
      .orderBy("ws", "event_type")
  }

  /** Custom per-key state (mapGroupsWithState): running per-user event
    * totals; the final state per user equals the batch count. At scale the
    * state store bounds memory per key and the shuffle is on user_id.
    */
  def statefulCounts(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    import spark.implicits._
    val staged = stage(spark, dir)
    val schema = spark.read.parquet(staged).schema
    val updates = spark.readStream
      .schema(schema)
      .parquet(staged)
      .selectExpr("user_id")
      .as[Long]
      .groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[Long], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + events.size
          state.update(total)
          (user, total)
      }
      .toDF("user_id", "n")
    // Update mode appends one row per key per micro-batch; the max is the
    // final state.
    runToTable(updates, "update")
      .groupBy("user_id").agg(max(col("n")).as("n"))
      .orderBy("user_id")
  }
}
