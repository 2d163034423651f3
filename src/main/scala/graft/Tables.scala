package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated star-schema testdata
  * (`/root/testdata/sf*`, see TESTDATA.md). One parquet file per table.
  *
  * All engine queries read through here so that scan options (schema
  * pruning, pushdown) stay consistent. At 100 TB these would be
  * partitioned/bucketed table paths; the API shape is unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read it as a nanos long (legacy conf) and convert to
    * microsecond TimestampType (truncation — sub-microsecond precision is
    * below every window/ordering granularity used here).
    *
    * The conf is normally set at session construction (Sessions.local /
    * SparkSuite); for externally-built sessions this self-heals — one
    * EXPLICIT session-wide effect, documented here: all TIMESTAMP(NANOS)
    * parquet in the session maps to LongType afterwards (only `events`
    * carries that type in this engine's data).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    if (!s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
