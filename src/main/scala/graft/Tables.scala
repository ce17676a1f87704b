package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table accessors for the driver's star schema + text/embedding
  * tables (see /root/repo/TESTDATA.md). Reads are plain declarative scans so
  * Catalyst pushes filters/projections into the parquet reader
  * (PushedFilters / ReadSchema in `.explain("formatted")`).
  *
  * At cluster scale the same accessors work unchanged against a directory of
  * many files per table; nothing here assumes a single file.
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
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects. Read it as raw long nanos (legacy conf) and rebuild a proper
    * microsecond TimestampType with integer division (the data has no
    * sub-microsecond components, verified — so this is lossless and matches
    * DuckDB's ns→µs view of the same values).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** One engine operator exposed through the driver contract: a named Spark
  * query plus (when SQL-expressible) a DuckDB oracle producing the exact same
  * rows, column names, and value representations.
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)
