package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.withOverrides(SparkSession.builder(), cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY=a,b,c — dump just those queries (local iteration);
    // the driver never sets it, so driver runs always dump everything
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // oracle_sql.json is written BEFORE the query loop (r9 verdict #3): it
    // used to be written last, so one hung query + a driver kill voided
    // every already-dumped result — the DuckDB compare had no SQL to run.
    // Now a killed run still yields a parseable partial correctness round.
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Per-query wall-clock bound (default 120 s — the slowest sf0.01 query
    // is <10 s warmed): a pathological query records its own error line
    // instead of wedging the dump loop until the driver's kill.
    // Try-parse with fallback (r10 ADVICE): a malformed value must not
    // abort the dump loop before any query runs.
    val timeoutSec = sys.env.get("SPARK_GRAFT_QUERY_TIMEOUT")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption.filter(_ > 0))
      .getOrElse {
        sys.env.get("SPARK_GRAFT_QUERY_TIMEOUT").foreach(v =>
          System.err.println(s"[verify] bad SPARK_GRAFT_QUERY_TIMEOUT '$v', using 120"))
        120
      }
    selected.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      HarnessGuard.run(spark, name, timeoutSec) {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      } match {
        case Right(_) =>
          // progress marker per completed dump: a killed run shows exactly
          // how far it got and which query it died in
          System.err.println(f"[verify] $name ok (${(System.nanoTime() - t0) / 1e9}%.1fs)")
        case Left(err) =>
          System.err.println(s"[verify] $name failed: $err")
      }
      // Queries persist() intermediates they can't unpersist before the
      // write action; clear between queries so caches don't compound
      // across the full 173-query session (see Bench.scala).
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
