package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders over the driver-generated parquet fixtures
  * (`/root/testdata/sf*`, see TESTDATA.md / FIXTURES.md).
  *
  * Every query in the inventory takes `(spark, sfDir)` and loads inputs
  * through here, so filters/projections written against these frames are
  * pushed straight into the parquet scan by Catalyst (PushedFilters /
  * ReadSchema — verified via `.explain("formatted")`).
  */
object Tables {
  // DataFrames are immutable plans; caching them avoids re-listing the
  // parquet footer on every one of the ~100 inventory queries.
  private val frames =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    frames.computeIfAbsent((spark, dir, name), { _ =>
      if (name == "events") eventsRaw(spark, dir)
      else spark.read.parquet(s"$dir/$name.parquet")
    })

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read as
    * a timestamp (PARQUET_TYPE_ILLEGAL). Read it as raw nanos
    * (nanosAsLong) and convert to a µs TIMESTAMP_NTZ — the same truncation
    * DuckDB's epoch_us applies, so oracles agree (SURVEY §7.6.3).
    */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts",
        org.apache.spark.sql.functions.expr(
          "CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  // Last directory registered per session: re-registering the same dir on
  // every query would re-read parquet footers for nothing; switching dirs
  // must re-point the views.
  private val lastDir =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  /** Register all fixture tables as temp views so `spark.sql` queries can
    * reference them by name (mirrors the reference's `register_table` /
    * `register_csv` catalog registration,
    * datafusion-flight-sql-server/tests/integration_test.rs:34-35).
    *
    * Temp views are a per-session namespace: if the caller has registered
    * its OWN view under a fixture name, the per-(session, dir) guard will
    * not re-point it — callers that mix fixture queries with their own
    * same-named views must use separate sessions (which is the service's
    * per-user session model anyway, A2).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    if (lastDir.get(spark) != dir) {
      names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
      lastDir.put(spark, dir) // only after every view registered successfully
    }

  /** Force every fixture view back to `dir`, bypassing the (session, dir)
    * guard. For callers that deliberately SHADOWED a fixture name with
    * their own temp view (hand-built test fixtures): a plain registerAll
    * afterwards is a silent no-op — the guard still remembers `dir` — and
    * the shadow would leak into every later consumer of the session.
    */
  def reregisterAll(spark: SparkSession, dir: String): Unit = {
    lastDir.remove(spark)
    registerAll(spark, dir)
  }
}
