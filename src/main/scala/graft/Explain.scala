package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: dumps `explain("formatted")` for the named queries
  * (or a default headline set) so scan pushdown (PushedFilters/ReadSchema),
  * join strategy (BroadcastHashJoin vs SortMergeJoin), and WholeStageCodegen
  * coverage can be reviewed per operator.
  *
  * Usage: runMain graft.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("rel_pricing_summary", "rel_scan_filter", "rel_join_broadcast_part",
        "rel_join_multiway_revenue", "rel_topk_orders", "text_top_tokens",
        "dedup_minhash_lsh")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries.get(n) match {
        case Some(fn) => fn(spark, sfDir).explain("formatted")
        case None     => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
