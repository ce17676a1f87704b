package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Degenerate-input robustness: every operator must run (not throw) on
  * structurally-valid but EMPTY tables — the state every incremental
  * production run starts from (new partition, fresh date, empty shard).
  *
  * r14: the sweep now covers the stream_* family too — both r13 ADVICE
  * schema-inference bugs (foreachBatch sinks re-read with inferred
  * schemas, which explode when an empty batch writes no part files)
  * lived exactly in the set the old exclusion skipped. The one remaining
  * harness artifact is handled per-sink: an AvailableNow replay with NO
  * batches never materializes a `format("memory")` table, so a missing
  * sink table reads as an empty frame (the production meaning of "the
  * stream saw no data"), not as a failure.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = TmpDirs.create("graft_empty").toFile
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    names.foreach { n =>
      Tables.table(spark, sf001, n).limit(0)
        .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/$n.parquet")
    }
    // events.ts is TIMESTAMP(NANOS) in the driver data, which a Spark write
    // cannot reproduce; raw long nanos reads identically through
    // Tables.events (the nanosAsLong path yields the same long column)
    val eventsSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], eventsSchema)
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/events.parquet")
    dir.getAbsolutePath
  }

  test("every batch operator runs on empty tables") {
    val failures = SparkEntry.allSpecs
      .filterNot(_.name.startsWith("stream_"))
      .flatMap { q =>
        try { q.fn(spark, emptyDir).count(); None }
        catch { case e: Throwable => Some(s"${q.name}: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(120)}") }
      }
    assert(failures.isEmpty, s"operators crashing on empty input:\n${failures.mkString("\n")}")
  }

  test("every streaming operator runs on empty tables (empty first ingest day)") {
    val failures = SparkEntry.allSpecs
      .filter(_.name.startsWith("stream_"))
      .flatMap { q =>
        try { q.fn(spark, emptyDir).count(); None }
        catch { case e: Throwable => Some(s"${q.name}: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(160)}") }
      }
    assert(failures.isEmpty, s"streaming operators crashing on empty input:\n${failures.mkString("\n")}")
  }
}
