package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every engine operator is a [[QuerySpec]] registered by its module; this
  * object is only the aggregation point the driver calls into.
  */
object SparkEntry {

  def allSpecs: Seq[QuerySpec] =
    ops.Relational.specs ++ ops.TextPipeline.specs ++ ops.Dedup.specs ++
      ops.Similarity.specs ++ ops.TextAnalysis.specs ++ ops.Sketches.specs ++
      ops.MllibOps.specs ++ streaming.StreamingOps.specs ++
      multimodal.Multimodal.specs ++ RunDetectors.specs ++
      sources.SccLoaderGate.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the reference's headline computation (top tokens of the preprocessed
    * corpus — SURVEY.md §7.2 M0). */
  def entry(spark: SparkSession): DataFrame =
    allSpecs.find(_.name == "text_top_tokens").get.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allSpecs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allSpecs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
