package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× synthetic stress gate (r11 verdict #3): measures — rather than
  * argues — that the scale-sensitive operators grow ≲-linearly in corpus
  * size. Stages a `mult`× copy of the sf documents table (id-offset
  * duplication, the verdict's prescription), times each target query at 1×
  * and `mult`×, and fails if the warm-wall ratio exceeds `mult × slack`.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.ScaleGate"
  *   optional: SPARK_GRAFT_SCALE_MULT (default 10),
  *             SPARK_GRAFT_SCALE_QUERIES (comma list; default the 5 below)
  *
  * Target list = the r11 verdict's watch items: dedup_ngram_jaccard (the
  * df≤100 hot-shingle cap must bound candidate fan-out — note id-offset
  * duplication multiplies every shingle's df by `mult`, so shingles near
  * the cap at 1× fall OUT of the candidate set at 10×; the gate measures
  * wall growth, not output equivalence), ta_winnowing (per-doc linear),
  * ta_token_pagerank (edge-aggregated graph, node set constant),
  * mm_dedup_cluster (2¹⁶-bounded driver union-find must stay bounded),
  * scc_run_summary (the 500-message cap must make it ~flat, ratio ≈ 1).
  *
  * Timing protocol: per scale, one untimed priming run (JIT, codegen,
  * fit-once artifacts — artifact caches are keyed by dataset dir, so each
  * scale builds its own), then `reps` timed runs; the reported wall is the
  * min (steady state, same convention as graft.Profile). Cold (priming)
  * walls are printed for context but the gate asserts on warm ratios:
  * cold walls fold one-off artifact builds into whichever scale runs
  * first and are load-noisy at 10× runtimes of minutes.
  *
  * Results are recorded in PERF.md ("10× scale gate" section).
  */
object ScaleGate {
  private val DefaultQueries = Seq(
    "dedup_ngram_jaccard", "ta_winnowing", "mm_dedup_cluster",
    "ta_token_pagerank", "scc_run_summary")

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.get("SPARK_GRAFT_SCALE_MULT").map(_.toInt).getOrElse(10)
    val queries = sys.env.get("SPARK_GRAFT_SCALE_QUERIES")
      .map(_.split(",").map(_.trim).toSeq).getOrElse(DefaultQueries)
    val reps = sys.env.get("SPARK_GRAFT_SCALE_REPS").map(_.toInt).getOrElse(2)
    val slack = 1.5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ------------------------------------------------------------- staging
    // The 5 targets read only `documents`; stage a mult× id-offset copy.
    // Coalesce to the same file multiplicity regime as the source (one
    // file at sf0.1) is NOT done — many output files is the realistic
    // cluster layout and keeps the write parallel.
    // staging keyed by the source table's datasetKey, so regenerated
    // testdata can never serve a stale staged copy
    val bigDir = s"/tmp/graft_scale/x${mult}_" +
      TmpDirs.md5Hex(Tables.datasetKey(base, "documents")).take(12)
    val bigTable = new java.io.File(s"$bigDir/documents.parquet")
    val docs = Tables.documents(spark, base)
    val maxId = docs.agg(max(col("doc_id"))).head.getLong(0) + 1L
    if (!bigTable.exists) {
      val t0 = System.nanoTime()
      (0 until mult).map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * maxId)))
        .reduce(_ unionAll _)
        .write.mode("overwrite").parquet(bigTable.getPath)
      println(f"[scale] staged $mult× documents at $bigDir in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    } else println(s"[scale] reusing staged $bigDir")

    // ------------------------------------------------------------- timing
    def wall(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }

    case class R(name: String, cold1: Double, warm1: Double,
                 coldN: Double, warmN: Double) {
      def ratio: Double = warmN / warm1
      def ok: Boolean = ratio <= mult * slack
    }

    val results = queries.map { q =>
      val cold1 = wall(q, base)
      val warm1 = (1 to reps).map(_ => wall(q, base)).min
      val coldN = wall(q, bigDir)
      val warmN = (1 to reps).map(_ => wall(q, bigDir)).min
      val r = R(q, cold1, warm1, coldN, warmN)
      println(f"[scale] ${r.name}%-22s 1x cold ${r.cold1}%6.2f warm ${r.warm1}%6.2f | " +
        f"${mult}x cold ${r.coldN}%6.2f warm ${r.warmN}%6.2f | ratio ${r.ratio}%5.2f " +
        (if (r.ok) "OK" else s"FAIL (> ${mult * slack})"))
      r
    }

    println("| query | 1× warm (s) | " + mult + "× warm (s) | ratio | bound | verdict |")
    println("|---|---|---|---|---|---|")
    results.foreach { r =>
      println(f"| ${r.name} | ${r.warm1}%.2f | ${r.warmN}%.2f | ${r.ratio}%.2f | ${mult * slack}%.0f | ${if (r.ok) "OK" else "FAIL"} |")
    }
    val bad = results.filterNot(_.ok)
    if (bad.nonEmpty) {
      println(s"[scale] FAIL: ${bad.map(_.name).mkString(", ")} exceeded ${mult}×$slack growth")
      spark.stop(); sys.exit(1)
    }
    println(s"[scale] PASS: all ${results.size} queries within ${mult}×$slack growth bound")
    spark.stop()
  }
}
