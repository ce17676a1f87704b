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

  /** Cache key for dataset-keyed fit-once artifacts and models:
    * (path, mtime, size) of the backing table file, so a dataset
    * regenerated at the same path within one JVM invalidates the cached
    * artifact instead of silently serving the old corpus's pairs /
    * labels / index / baseline (the ivfKey convention, shared by every
    * artifact cache). */
  def datasetKey(dir: String, name: String): String = {
    val f = new java.io.File(s"$dir/$name.parquet")
    s"$dir|${f.lastModified}|${f.length}"
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts has shipped in two parquet layouts across driver data
    * generations: TIMESTAMP(NANOS) (which Spark's vectorized reader rejects —
    * read as raw long nanos via the legacy conf and rebuilt as µs; lossless,
    * the data has no sub-microsecond components) and plain TIMESTAMP(MICROS)
    * with isAdjustedToUTC=false (inferred as TIMESTAMP_NTZ — cast to the
    * session-zone instant, wall-clock-identical under the pinned UTC
    * session, matching DuckDB's naive-timestamp view of the same values).
    * Dispatch on the actual file schema so both generations read
    * identically; downstream always sees a µs TimestampType `ts`.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
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
