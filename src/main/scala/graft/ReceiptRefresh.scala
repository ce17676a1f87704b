package graft

import org.apache.spark.sql.SparkSession

/** Full-registry receipt capture (r18 verdict #2: every r18 full bench ran
  * a uniform 7–12 % above receipts AFTER box normalization — the receipt
  * set had gone stale as a set). This tool runs EVERY registered query
  * in one documented session — warmed (the shared [[Warmup]] entry
  * point), N reps (min kept) with the Bench/Profile clearCache hygiene,
  * fixed alphabetical order — and writes a fresh `perf_receipts.tsv`
  * with the capture-time canaries recorded (`__parallel_canary`,
  * `__parallel_canary_threads`) so Bench's suspect thresholds and
  * `wall_receipt_normalized` self-scale from THIS session's box state.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.ReceiptRefresh [reps] [outPath]"
  *
  * **Capture mode matters (r19 finding):** a receipt meant to predict
  * IN-BENCH walls must be captured in BENCH context — one single-shot
  * pass over the registry per JVM (`reps = 1`), because the bench runs
  * each query once and its wall includes the query's own in-context
  * whole-stage-codegen + JIT first use. Back-to-back min-of-3 reps
  * measure the post-JIT steady state, which sits a structural ~20-30 %
  * BELOW in-bench walls (measured: a min-of-3 receipt set put a
  * clean-box bench at wall_receipt_normalized 1.26). The committed
  * receipt set is the per-query MEDIAN of 3 single-pass captures in
  * separate JVMs (scripts: see ROUND_CLOSE.md). Isolated `graft.Profile`
  * min-of-3 remains the right tool for RELATIVE plan comparisons — just
  * not for receipts.
  *
  * Run it on a QUIET box only: the start/end canary pair is printed and
  * embedded in the file header; a drifted run (end/start > 1.3 or a
  * parallel canary far off the historical quiet value) should be
  * discarded, not committed. The tool refuses to write if any query
  * errors.
  */
object ReceiptRefresh {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val outPath = if (args.length > 1) args(1) else "src/main/resources/perf_receipts.tsv"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.withOverrides(SparkSession.builder(), cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val canaryStart = Canary.single()
    val parCanary = Canary.parallelStable(cpus.toInt)
    println(f"[receipts] cpu_canary $canaryStart%.3f s, parallel_canary($cpus) $parCanary%.3f s")
    val skipped = Warmup.run(spark, sfDir)
    if (skipped > 0)
      println(s"[receipts] WARNING: $skipped warmup phases skipped/cut — first-use costs may leak into receipts")

    val names = SparkEntry.queries.keys.toSeq.sorted
    var failed = List.empty[String]
    val walls = names.map { name =>
      val fn = SparkEntry.queries(name)
      val runs = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        val err = HarnessGuard.run(spark, name, 120) { fn(spark, sfDir).count() }
          .left.toOption
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        err.foreach { m => failed ::= s"$name: $m" }
        dt
      }
      val best = runs.min
      println(f"[receipts] $name%-32s ${runs.map(r => f"$r%.3f").mkString(" ")} -> $best%.3f")
      name -> best
    }
    val canaryEnd = Canary.single()
    val parEnd = Canary.parallelStable(cpus.toInt)
    val drift = if (canaryStart > 0) canaryEnd / canaryStart else 1.0
    println(f"[receipts] canary end $canaryEnd%.3f (drift $drift%.2f), parallel end $parEnd%.3f")
    if (failed.nonEmpty) {
      println(s"[receipts] FAIL: ${failed.size} query errors — not writing:\n  ${failed.mkString("\n  ")}")
      spark.stop(); sys.exit(1)
    }
    val date = java.time.LocalDate.now(java.time.ZoneOffset.UTC)
    def f3(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    val header =
      s"""# Warmed per-query receipts (seconds, $sfDir, local[$cpus]):
         |# graft.ReceiptRefresh capture, $date — min of $reps warmed reps per
         |# query, shared Warmup first, clearCache between runs, alphabetical
         |# order. Bench flags a run >2x its (box-scaled) receipt as
         |# first_use_suspect; wall_receipt_normalized uses the sum.
         |# Capture-session box state: cpu_canary ${f3(canaryStart)} -> ${f3(canaryEnd)}
         |# (drift ${f3(drift)}), parallel_canary($cpus) ${f3(parCanary)} -> ${f3(parEnd)}.
         |""".stripMargin
    val rows = walls.map { case (n, w) => s"$n\t${f3(w)}" }.mkString("\n")
    val canaryRows =
      s"""# Reserved capture-context rows (not queries): the parallel-throughput
         |# canary measured when these receipts were captured, and its thread
         |# count. Bench scales suspect thresholds by today's parallel canary /
         |# this value (clamped to [1, 3]) and normalizes the headline wall by
         |# the raw ratio, so receipts self-scale with the box.
         |__parallel_canary\t${f3(parCanary)}
         |__parallel_canary_threads\t$cpus""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
      header + rows + "\n" + canaryRows + "\n")
    println(s"[receipts] ${walls.size} receipts written to $outPath")
    spark.stop()
  }
}
