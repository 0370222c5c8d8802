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
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

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

  /** Register all fixture tables as temp views so `spark.sql` queries can
    * reference them by name (mirrors the reference's `register_table` /
    * `register_csv` catalog registration,
    * datafusion-flight-sql-server/tests/integration_test.rs:34-35).
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
  }
}
