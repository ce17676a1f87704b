package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Cross-batch streaming-state semantics (SURVEY.md ST5): the single-batch
  * AvailableNow run in Verify can't show state carrying across triggers, so
  * drive a MemoryStream two batches apart and assert check-then-insert
  * behavior — first sight never flags, later sights do (fidelity trap #1). */
class StreamingSpec extends SparkSpec {
  import graft.streaming.StreamingOps.{SeenFlag, ShinglePair}

  test("stateful dedup: state persists across triggers (check-then-insert)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ShinglePair]
    val flags = input.toDS().groupByKey(_.sh)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (_: String, it: Iterator[ShinglePair], state: GroupState[Long]) => {
          val arrived = it.toSeq.sortBy(_.doc_id)
          val priorMin = state.getOption.getOrElse(Long.MaxValue)
          val batchMin = arrived.head.doc_id
          val out = arrived.map { e =>
            SeenFlag(e.doc_id, if (math.min(priorMin, batchMin) < e.doc_id) 1.0 else 0.0)
          }
          state.update(math.min(priorMin, batchMin))
          out.iterator
        })
    val q = flags.toDF().writeStream.format("memory").queryName("test_dedup_sink")
      .outputMode("update").start()
    try {
      // batch 1: doc 1 introduces shingle "a b c"; doc 2 repeats it
      input.addData(ShinglePair(1, "a b c"), ShinglePair(2, "a b c"))
      q.processAllAvailable()
      // batch 2: doc 3 repeats it from cold state; doc 4 introduces a new one
      input.addData(ShinglePair(3, "a b c"), ShinglePair(4, "x y z"))
      q.processAllAvailable()
      val rows = spark.table("test_dedup_sink").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("seen")).toMap
      assert(rows(1) == 0.0, "first sight must not flag")
      assert(rows(2) == 1.0, "same-batch later sight must flag")
      assert(rows(3) == 1.0, "cross-batch sight must flag (state persisted)")
      assert(rows(4) == 0.0, "new shingle in batch 2 must not flag")
    } finally q.stop()
  }

  test("streaming windowed counts equal the batch tumbling aggregation") {
    val streamed = SparkEntry.queries("stream_windowed_counts")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val batch = graft.Tables.events(spark, sf001)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("stream-static enrichment equals the batch dimension join") {
    val streamed = SparkEntry.queries("stream_static_enrich")(spark, sf001)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_above_avg"), r.getAs[Double]("above_share"))).toSet
    val docs = graft.Tables.documents(spark, sf001)
    val dim = docs.groupBy(col("source")).agg(avg(col("n_chars")).as("avg_chars"))
    val batch = docs.join(dim, "source")
      .withColumn("above", (col("n_chars") > col("avg_chars")).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("above")).as("n_above_avg"))
      .withColumn("above_share",
        round(col("n_above_avg").cast("double") / col("n_docs"), 4))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_above_avg"), r.getAs[Double]("above_share"))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("incremental intake: session shuffle sizing ≡ forced legacy 4-partition plan") {
    // r19 (r18 verdict #1): the intake foreachBatch body now runs at the
    // session's shuffle sizing (its output write was throttled by the
    // replay tuning's 4 writer tasks at 1000×); partitioning is a
    // physical property, so the emitted links must be identical.
    def run() = SparkEntry.queries("stream_incremental_intake")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val default = run()
    sys.props("graft.intake.partitions") = "4"
    val legacy = try run() finally sys.props.remove("graft.intake.partitions")
    assert(default.nonEmpty && default == legacy)
  }

  test("foreachBatch sink: replaying a batch overwrites, never duplicates") {
    import spark.implicits._
    val out = TmpDirs.create("graft_febatch_test").toString
    val batch = (1L to 100L).toDF("event_id")
    // at-least-once delivery: the same batchId arrives twice (failure
    // between the sink write and the checkpoint commit) — the second
    // attempt must REPLACE the first, not append to it
    graft.streaming.StreamingOps.writeBatchIdempotent(batch, 0L, out)
    graft.streaming.StreamingOps.writeBatchIdempotent(batch, 0L, out)
    graft.streaming.StreamingOps.writeBatchIdempotent(batch.limit(50), 1L, out)
    val readBack = spark.read.parquet(s"$out/batch=*")
    assert(readBack.count() == 150,
      s"replayed batch 0 must not duplicate: ${readBack.count()}")
  }

  test("stream_stream_join: JoinAb provider/partition knobs don't change results (r20)") {
    // graft.JoinAb forces the state-store provider / partition count /
    // changelog checkpointing through withReplayTuning's sys-prop knobs
    // for the stage attribution A/B — all three are state-store SIZING,
    // so the joined output must be row-identical under any of them.
    def rows() = SparkEntry.queries("stream_stream_join")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val default = rows()
    sys.props("graft.replay.provider") = "hdfs"
    sys.props("graft.replay.partitions") = "7"
    val forced =
      try rows()
      finally {
        sys.props.remove("graft.replay.provider")
        sys.props.remove("graft.replay.partitions")
      }
    assert(default.nonEmpty && default == forced,
      s"provider/partition sizing changed the join output: ${default.size} vs ${forced.size}")
  }
}
