package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-split attribution of `stream_incremental_intake`'s scale
  * behavior (r18 verdict #1: intake's 1000× warm ratio is 105 while its
  * batch siblings hold ~35 — super-linear but unattributed).
  *
  * The intake query = fit-once index build + per-batch probe
  * ([[graft.ops.Dedup.probeLshFrames]]) + an idempotent parquet sink +
  * a sorted readback — run inside the streaming replay tuning, which
  * pins `spark.sql.shuffle.partitions = 4`. Its batch twin
  * `dedup_incremental` runs the SAME probe at the session's 32. This
  * harness times each probe stage CUMULATIVELY (batch signature pass →
  * batch dictionary → band candidates → verified rep links → member
  * expansion → sink write + sorted readback) at both partition settings
  * on the same staged mult× dataset, same JVM, back to back — the
  * same-box A/B discipline — so the super-linear residue lands on a
  * named stage instead of a narrative.
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_SCALE_MULT=300 \
  *     sbt "runMain graft.IntakeAb"
  *   knobs: SPARK_GRAFT_INTAKE_PARTS (default "4,32"),
  *          SPARK_GRAFT_INTAKE_OUT (default intake_ab.json),
  *          SPARK_GRAFT_INTAKE_FULL=1 also times the two full registry
  *          queries (streaming intake + batch twin) for reference.
  *
  * Staging reuses ScaleGate's documents-only id-offset scheme and dir
  * convention byte-for-byte, so existing staged copies serve both tools.
  */
object IntakeAb {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.get("SPARK_GRAFT_SCALE_MULT").map(_.toInt).getOrElse(300)
    val parts = sys.env.getOrElse("SPARK_GRAFT_INTAKE_PARTS", "4,32")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val outPath = sys.env.getOrElse("SPARK_GRAFT_INTAKE_OUT", "intake_ab.json")
    val runFull = sys.env.get("SPARK_GRAFT_INTAKE_FULL").exists(v => v == "1" || v == "true")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    val spark = Sessions.withOverrides(SparkSession.builder(), cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val spill = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled): Unit
        }
      }
    })

    // ---- staging: ScaleGate's documents-only scheme, shared dir ----
    val dir =
      if (mult == 1) base
      else {
        val d = s"/tmp/graft_scale/x${mult}_" +
          TmpDirs.md5Hex(Tables.datasetKey(base, "documents")).take(12)
        val bigTable = new java.io.File(s"$d/documents.parquet")
        val docs = Tables.documents(spark, base)
        if (!new java.io.File(bigTable, "_SUCCESS").exists) {
          val maxId = docs.agg(max(col("doc_id"))).head.getLong(0) + 1L
          val t0 = System.nanoTime()
          (0 until mult).map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * maxId)))
            .reduce(_ unionAll _)
            .write.mode("overwrite").parquet(bigTable.getPath)
          println(f"[intake-ab] staged $mult× documents in ${(System.nanoTime() - t0) / 1e9}%.1f s")
        } else println(s"[intake-ab] reusing staged $d")
        d
      }

    def timed[T](label: String)(body: => T): (T, Double, Long) = {
      org.apache.spark.graft.GraftCoreShim.drainListenerBus(spark.sparkContext)
      spill.set(0)
      val t0 = System.nanoTime()
      val r = body
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.GraftCoreShim.drainListenerBus(spark.sparkContext)
      println(f"[intake-ab] $label%-28s ${wall}%8.2f s  spill ${spill.get / 1048576}%6d MiB")
      (r, wall, spill.get)
    }

    val results = scala.collection.mutable.ArrayBuffer.empty[String]
    // partitions recorded as a JSON STRING (r19 ADVICE #3): entries come
    // from SPARK_GRAFT_INTAKE_PARTS, and an unquoted non-numeric value
    // used to produce an invalid artifact
    def record(stage: String, p: String, wall: Double, sp: Long, rows: Long): Unit =
      results += s"""{"stage":"${stage}","partitions":"$p","wall":${f3(wall)},""" +
        s""""spill":$sp,"rows":$rows}"""
    def f3(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)

    val docs = Tables.documents(spark, dir)
    val half = docs.count() / 2

    // fit-once index, as the production shape amortizes it (timed; cold
    // on a fresh build fingerprint, warm disk read otherwise)
    val (idx, idxWall, idxSpill) = timed("index_build_or_load") {
      graft.ops.Dedup.corpusLshIndex(dir,
        graft.ops.Dedup.sigWithArray(docs.filter(col("doc_id") < half)))
    }
    // the index stage runs at the SESSION's sizing, not a hardcoded 32
    // (r19 ADVICE #3)
    record("index_build_or_load", cpus, idxWall, idxSpill, -1)

    parts.foreach { p =>
      spark.conf.set("spark.sql.shuffle.partitions", p)
      // batch signature pass: map-only native minhash, persisted once per
      // setting (the intake foreachBatch persists it per micro-batch)
      val batchSig = graft.ops.Dedup.sigWithArray(docs.filter(col("doc_id") >= half)).persist()
      val (nSig, sigWall, sigSpill) = timed(s"sig_batch p=$p")(batchSig.count())
      record("sig_batch", p, sigWall, sigSpill, nSig)
      val frames = graft.ops.Dedup.probeLshFrames(spark, batchSig, idx)
      Seq("batch_groups", "cand", "rep_links", "out").foreach { st =>
        val (n, w, sp) = timed(s"$st p=$p")(frames(st).count())
        record(st, p, w, sp, n)
      }
      // the sink shape: idempotent parquet write + sorted readback —
      // what intake pays over its batch twin's bare count
      val sinkDir = TmpDirs.create("graft_intake_ab_sink").toString
      val (_, wWall, wSpill) = timed(s"out_write p=$p") {
        frames("out").write.mode("overwrite").parquet(s"$sinkDir/batch=0")
      }
      record("out_write", p, wWall, wSpill, -1)
      val (nRb, rbWall, rbSpill) = timed(s"readback_sorted p=$p") {
        spark.read.schema("batch_id BIGINT, corpus_id BIGINT, est_jaccard DOUBLE")
          .parquet(s"$sinkDir/batch=*")
          .orderBy(col("batch_id"), col("corpus_id")).count()
      }
      record("readback_sorted", p, rbWall, rbSpill, nRb)
      batchSig.unpersist()
      spark.catalog.clearCache()
      System.gc()
    }
    spark.conf.set("spark.sql.shuffle.partitions", cpus)

    if (runFull) {
      Seq("dedup_incremental", "stream_incremental_intake").foreach { q =>
        val (n, w, sp) = timed(s"full $q")(SparkEntry.queries(q)(spark, dir).count())
        record(s"full_$q", cpus, w, sp, n)
        spark.catalog.clearCache()
        System.gc()
      }
    }

    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
      s"""{"mult":$mult,"sf":"$base","stages":[${results.mkString(",")}]}""" + "\n")
    println(s"[intake-ab] artifact written to $outPath")
    spark.stop()
  }
}
