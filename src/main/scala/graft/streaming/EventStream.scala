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

  /** The streaming result equals the batch aggregation — which is exactly
    * what the DuckDB oracle computes.
    */
  val specs: Map[String, QuerySpec] = Map(
    "q_stream_window" -> QuerySpec.df(
      (s, d) => windowedCounts(s, d),
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws, event_type, COUNT(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin))

  /** Replay events as a stream → tumbling-window counts. Returns the final
    * (batch-equivalent) result so correctness is oracle-checkable.
    */
  def windowedCounts(spark: SparkSession, dir: String): DataFrame = {
    // Stage the µs-normalized events once (the raw fixture is ns-precision
    // parquet which Spark can't stream directly).
    val staged = "/root/repo/target/fixtures/events_us.parquet"
    Tables.events(spark, dir).write.mode("overwrite").parquet(staged)
    val schema = spark.read.parquet(staged).schema

    val queryName = s"graft_event_stream_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val stream = spark.readStream
      .schema(schema)
      .parquet(staged)
      // watermarks require an instant (TIMESTAMP); session tz is UTC so the
      // NTZ wall-clock maps 1:1 and the window starts cast back losslessly
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))

    val query = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    try {
      query.processAllAvailable()
    } finally {
      query.stop()
    }

    spark.table(queryName)
      .select(col("window.start").cast("timestamp_ntz").as("ws"),
        col("event_type"), col("n"))
      .orderBy("ws", "event_type")
  }
}
