package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-split attribution of `stream_stream_join`'s scale behavior
  * (r19 verdict #7: 735 s at 1000×, ratio 273, state linear, zero spill
  * — certified linear-state but the wall itself was unattributed).
  *
  * The replay is ONE AvailableNow micro-batch: both event streams are
  * buffered into the join's four state stores, probed, and committed.
  * The join ARITHMETIC is exactly the batch interval join on the same
  * table, so timing the batch twin on the same staged data in the same
  * JVM gives the state-free floor; the streaming wall minus that floor
  * is state-store machinery by construction. The config grid then
  * splits the machinery: HDFS-backed vs RocksDB provider (native-store
  * write/commit cost), RocksDB ± changelog checkpointing (snapshot
  * upload vs changelog write at commit), and 4 vs `cpus` state
  * partitions (per-instance open/commit overhead vs parallelism —
  * state operators pin partitioning at first start, so each config gets
  * a fresh checkpoint via the query's own TmpDir).
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_SCALE_MULT=100 \
  *     sbt "runMain graft.JoinAb"
  *   knobs: SPARK_GRAFT_JOINAB_OUT (default join_ab.json),
  *          SPARK_GRAFT_JOINAB_REPS (default 2 — cold + warm per config)
  *
  * Staging reuses ScaleGate's events id-offset scheme (ts normalized on
  * the way in, disjoint event_id/user_id universes per copy) under a
  * content-keyed dir, so repeated runs reuse the copy.
  */
object JoinAb {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.get("SPARK_GRAFT_SCALE_MULT").map(_.toInt).getOrElse(100)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_JOINAB_OUT", "join_ab.json")
    val reps = sys.env.get("SPARK_GRAFT_JOINAB_REPS").map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    val spark = Sessions.withOverrides(SparkSession.builder(), cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- staging: ScaleGate's events scheme (disjoint universes) ----
    val dir = s"/tmp/graft_joinab/x${mult}_" +
      TmpDirs.md5Hex(Tables.datasetKey(base, "events")).take(12)
    val bigTable = new java.io.File(s"$dir/events.parquet")
    if (!new java.io.File(bigTable, "_SUCCESS").exists) {
      def deleteRecursively(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).getOrElse(Array.empty).foreach(deleteRecursively)
        f.delete(): Unit
      }
      deleteRecursively(bigTable)
      val t0 = System.nanoTime()
      val src = Tables.events(spark, base) // ts normalized on the way in
      (0 until mult).map { i =>
        src.withColumn("event_id", col("event_id") + lit(i * 1000000000L))
          .withColumn("user_id", col("user_id") + lit(i * 1000000000L))
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(bigTable.getPath)
      println(f"[joinab] staged $mult× events at $dir in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    } else println(s"[joinab] reusing staged $dir")

    val results = scala.collection.mutable.ListBuffer.empty[String]
    def f3(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // ---- batch twin: the state-free floor (same arithmetic, same data)
    val ev = Tables.events(spark, dir)
    def batchTwin(): Long = {
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("purchase_ts"))
      val v = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id").as("v_user"), col("ts").as("view_ts"))
      p.join(v, expr(
        """v_user = user_id AND
          |view_ts >= purchase_ts - INTERVAL 1 HOUR AND
          |view_ts < purchase_ts""".stripMargin))
        .select(col("purchase_id"), col("view_id"), col("user_id")).count()
    }
    (1 to reps).foreach { i =>
      val (n, w) = time(batchTwin())
      spark.catalog.clearCache(); System.gc()
      println(f"[joinab] batch_twin rep $i: $w%.2f s ($n rows)")
      results += s"""{"config":"batch_twin","rep":$i,"wall":${f3(w)},"rows":$n}"""
    }

    // ---- streaming config grid over the SAME staged dir ----
    val grid = Seq(
      ("default_rocksdb_adaptive", Map.empty[String, String]),         // shipped (r20): adaptive partitions
      ("rocksdb_p4_legacy", Map("graft.replay.partitions" -> "4")),    // the r16-r19 constant
      ("hdfs_adaptive", Map("graft.replay.provider" -> "hdfs")),
      ("rocksdb_adaptive_changelog", Map("graft.replay.changelog" -> "true")))
    grid.foreach { case (name, props) =>
      props.foreach { case (k, v) => sys.props(k) = v }
      try {
        (1 to reps).foreach { i =>
          val (n, w) = time(SparkEntry.queries("stream_stream_join")(spark, dir).count())
          spark.catalog.clearCache(); System.gc()
          println(f"[joinab] $name rep $i: $w%.2f s ($n rows)")
          results += s"""{"config":"$name","rep":$i,"wall":${f3(w)},"rows":$n}"""
        }
      } finally props.keys.foreach(sys.props.remove(_))
    }

    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
      s"""{"mult":$mult,"base":"$base","cpus":"$cpus","runs":[
         |${results.mkString(",\n")}
         |]}
         |""".stripMargin)
    println(s"[joinab] artifact written to $outPath")
    spark.stop()
  }
}
