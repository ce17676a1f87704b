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
  /** When armed (see [[recordReads]]), every table-name resolution against
    * a dataset dir is recorded — ScaleGate uses this to learn which tables
    * a selected query actually touches BEFORE staging scaled copies
    * (r17 verdict #2: watch mode staged only `documents` but accepted any
    * query list, so a non-documents selection crashed mid-sweep). Both
    * resolution points record: [[table]] (every batch accessor) and
    * [[datasetKey]] (fit-once artifact keys + the streaming stage-as-dir
    * shim) — over-recording a consulted-but-unread table only costs an
    * extra staged copy; under-recording is the crash. */
  private val readRecorder =
    new java.util.concurrent.atomic.AtomicReference[scala.collection.mutable.Set[String]](null)

  /** Run `body` with read recording armed; returns the set of table names
    * resolved while it ran. Not reentrant; recording is JVM-global. */
  private[graft] def recordReads[T](body: => T): Set[String] = {
    val acc = scala.collection.mutable.Set.empty[String]
    readRecorder.set(acc)
    try { body; acc.synchronized(acc.toSet) }
    finally readRecorder.set(null)
  }

  private def record(name: String): Unit = {
    val r = readRecorder.get()
    if (r ne null) { r.synchronized { r += name }; () }
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    record(name)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Cache key for dataset-keyed fit-once artifacts and models:
    * (path, mtime, size) of the backing table file, so a dataset
    * regenerated at the same path within one JVM invalidates the cached
    * artifact instead of silently serving the old corpus's pairs /
    * labels / index / baseline (the ivfKey convention, shared by every
    * artifact cache). */
  def datasetKey(dir: String, name: String): String = {
    record(name)
    val f = new java.io.File(s"$dir/$name.parquet")
    s"$dir|${f.lastModified}|${f.length}"
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")

  /** Timestamp columns have shipped in two parquet layouts across driver
    * data generations (events.ts changed mid-round-9): TIMESTAMP(NANOS)
    * (which Spark's vectorized reader rejects — read as raw long nanos
    * via the legacy conf and rebuilt as µs; lossless, the data has no
    * sub-microsecond components) and plain TIMESTAMP(MICROS) with
    * isAdjustedToUTC=false (inferred as TIMESTAMP_NTZ — cast to the
    * session-zone instant, wall-clock-identical under the pinned UTC
    * session, matching DuckDB's naive-timestamp view of the same
    * values). Dispatch on the ACTUAL file schema so every generation
    * reads identically; downstream always sees a µs TimestampType.
    * Applied to every table with a timestamp column (orders.o_orderdate
    * and lineitem.l_shipdate share events.ts's exposure — a layout
    * shift there would otherwise take out every orders/lineitem query
    * at the round gate, the failure mode the events fix handled). */
  /** The layout dispatch itself, shared with the STREAMING reader
    * (StreamingOps.eventsStream) so a new driver data generation is
    * handled in exactly one place — the batch and streaming views of the
    * same events table must never disagree (review finding: the match
    * was duplicated). Works on batch and streaming frames alike. */
  private[graft] def normalizedTs(df: DataFrame, tsCol: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema(tsCol).dataType match {
      case LongType => df.withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
      case TimestampNTZType => df.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case _ => df
    }
  }

  private def adaptTs(s: SparkSession, d: String, name: String, tsCol: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizedTs(table(s, d, name), tsCol)
  }

  def orders(s: SparkSession, d: String): DataFrame =
    adaptTs(s, d, "orders", "o_orderdate")
  def lineitem(s: SparkSession, d: String): DataFrame =
    adaptTs(s, d, "lineitem", "l_shipdate")
  def events(s: SparkSession, d: String): DataFrame =
    adaptTs(s, d, "events", "ts")
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
