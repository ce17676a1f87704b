package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.Trigger

/** The driver has shipped the events table in two parquet layouts across
  * data generations: `ts` as TIMESTAMP(NANOS) — which Spark can only read
  * as raw long nanos via the legacy conf — through r8, and plain
  * TIMESTAMP(MICROS) (inferred TIMESTAMP_NTZ) from r9. The r9 regen broke
  * every events-touching query until the readers became schema-adaptive.
  * This spec pins the adaptivity so the NEXT layout change fails here
  * first, with a message naming the dispatch, instead of as 100+ opaque
  * driver-gate failures: both layouts must read byte-identically through
  * graft.Tables.events and streaming.StreamingOps.eventsStream, and both
  * must hand downstream a µs TimestampType `ts`.
  */
class SchemaDriftSpec extends SparkSpec {

  private val eventRows = Seq(
    // (event_id, epochMicros, user_id, event_type, value, props)
    (1L, 1704067200000000L, 10L, "view", 1.5, """{"k":"a"}"""),
    (2L, 1704067201123456L, 11L, "click", 2.5, """{"k":"b"}"""),
    (3L, 1704153599999999L, 10L, "purchase", 9.0, null: String))

  /** events.parquet with ts as raw long NANOS (the pre-r9 read shape). */
  private lazy val nanosDir: String = {
    val dir = TmpDirs.create("graft_drift_nanos").toFile
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val rows = eventRows.map { case (id, us, u, t, v, p) =>
      Row(id, us * 1000L, u, t, v, p)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/events.parquet")
    dir.getAbsolutePath
  }

  /** events.parquet with ts as TIMESTAMP_NTZ micros (the r9 layout). */
  private lazy val ntzDir: String = {
    val dir = TmpDirs.create("graft_drift_ntz").toFile
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val rows = eventRows.map { case (id, us, u, t, v, p) => Row(id, us, u, t, v, p) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      // micros since epoch -> wall-clock NTZ value (UTC session, lossless)
      .withColumn("ts", timestamp_micros(col("ts")).cast(TimestampNTZType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/events.parquet")
    dir.getAbsolutePath
  }

  test("Tables.events reads the nanos-long and NTZ-micros layouts identically") {
    val a = Tables.events(spark, nanosDir)
    val b = Tables.events(spark, ntzDir)
    assert(a.schema("ts").dataType === TimestampType,
      "nanos layout must surface a µs TimestampType ts")
    assert(b.schema("ts").dataType === TimestampType,
      "NTZ layout must surface a µs TimestampType ts")
    val fmt = date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
    val va = a.select(col("event_id"), fmt.as("t")).orderBy("event_id").collect().toSeq
    val vb = b.select(col("event_id"), fmt.as("t")).orderBy("event_id").collect().toSeq
    assert(va === vb, "same logical events must read identically from both layouts")
    // µs precision survives end to end (the .999999 row would expose
    // any ms-rounding shortcut in either dispatch arm)
    assert(va.map(_.getString(1)).contains("2024-01-01 23:59:59.999999"))
  }

  test("streaming eventsStream adapts to both layouts with equal results") {
    def replay(dir: String, sink: String): Seq[Row] = {
      val src = graft.streaming.StreamingOps.eventsStream(spark, dir)
      assert(src.schema("ts").dataType === TimestampType,
        s"streaming ts must be TimestampType for $dir")
      val q = src.select(col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("t"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.table(sink).orderBy("event_id").collect().toSeq
    }
    val va = replay(nanosDir, "drift_nanos_sink")
    val vb = replay(ntzDir, "drift_ntz_sink")
    assert(va === vb)
    assert(va.nonEmpty)
  }

  test("Tables.orders dispatches o_orderdate across both layouts (shared adaptTs)") {
    // orders.o_orderdate and lineitem.l_shipdate share events.ts's
    // layout exposure; they now route through the same dispatch, so the
    // next generation shift fails HERE first, not as a gate wipeout.
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", LongType), StructField("o_orderpriority", StringType)))
    val us = 820540800000000L // 1996-01-02 00:00:00 UTC
    def write(dir: java.nio.file.Path, nanos: Boolean): String = {
      val rows = Seq(Row(1L, 2L, "O", 173665.47, if (nanos) us * 1000L else us, "1-URGENT"))
      val base = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      (if (nanos) base
       else base.withColumn("o_orderdate",
         timestamp_micros(col("o_orderdate")).cast(TimestampNTZType)))
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      dir.toString
    }
    val a = Tables.orders(spark, write(TmpDirs.create("graft_drift_ord_nanos"), nanos = true))
    val b = Tables.orders(spark, write(TmpDirs.create("graft_drift_ord_ntz"), nanos = false))
    assert(a.schema("o_orderdate").dataType === TimestampType)
    assert(b.schema("o_orderdate").dataType === TimestampType)
    val fmt = date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
    assert(a.select(fmt).collect().toSeq === b.select(fmt).collect().toSeq)
    assert(a.select(fmt).head.getString(0) === "1996-01-02 00:00:00.000000")
  }
}
