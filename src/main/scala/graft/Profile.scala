package graft
import org.apache.spark.sql.SparkSession

/** Steady-state profiler: runs one named query N times in a warmed session
  * so per-query cost separates from the ~5s first-job session warmup that
  * lands on whatever Bench happens to run first.
  *
  *   SPARK_GRAFT_SF_DIR=... runMain graft.Profile <query> [n]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val n = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      println(f"[profile] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($rows rows)")
      // same hygiene as Bench/Verify: drop per-query persists between runs
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
