package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lemmatization (SURVEY.md T3 — reference uses NLTK WordNet,
  * base_dataset_loader.py:80,89; no JVM twin exists, §7.5). Strategy: an
  * explicit word→lemma dictionary applied either as
  *
  *  - a broadcast-map UDF (`lemmaUdf`) for per-token columns, or
  *  - a broadcast dimension join (`lemmatizeTokens`) inside token pipelines
  *    — the declarative form Catalyst can optimize, and the form the DuckDB
  *    oracle can reproduce with the identical VALUES list.
  *
  * The dictionary is deliberately explicit and versioned with the code:
  * lemma parity with NLTK is unattainable without its data files, so the
  * contract is "this dictionary, exactly" (fixture-pinned), not "whatever
  * NLTK does".
  */
object Lemmatizer {

  /** Explicit lemma dictionary (irregular plurals + common inflections of
    * the corpus vocabulary). */
  val DICT: Seq[(String, String)] = Seq(
    "rows" -> "row", "queries" -> "query", "tables" -> "table",
    "keys" -> "key", "values" -> "value", "parts" -> "part",
    "columns" -> "column", "lines" -> "line", "customers" -> "customer",
    "streams" -> "stream", "windows" -> "window", "batches" -> "batch",
    "merges" -> "merge", "scans" -> "scan", "sorts" -> "sort",
    "joins" -> "join", "filters" -> "filter", "groups" -> "group",
    "running" -> "run", "sorted" -> "sort", "joined" -> "join",
    "filtered" -> "filter", "grouped" -> "group", "scanned" -> "scan",
    "merged" -> "merge", "children" -> "child", "mice" -> "mouse",
    "data" -> "datum")

  /** SQL VALUES literal of the dictionary, for oracle strings. */
  val dictSqlValues: String =
    DICT.map { case (w, l) => s"('$w', '$l')" }.mkString(", ")

  /** Broadcast-map scalar UDF: lemma(token). */
  def lemmaUdf(s: SparkSession): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val bc = s.sparkContext.broadcast(DICT.toMap)
    udf((t: String) => if (t == null) null else bc.value.getOrElse(t, t))
  }

  /** Declarative form: explode-join-coalesce over a broadcast lemma dim.
    * `df` must carry (rowId, token); returns (rowId, token=lemma'd). */
  def lemmatizeTokens(s: SparkSession, df: DataFrame, tokenCol: String): DataFrame = {
    import s.implicits._
    val dict = DICT.toDF("word", "lemma")
    df.join(broadcast(dict), df(tokenCol) === col("word"), "left")
      .withColumn(tokenCol, coalesce(col("lemma"), col(tokenCol)))
      .drop("word", "lemma")
  }

  /** Column form for array columns: transform via a map literal. */
  def lemmatizeArray(toks: Column): Column = {
    val m = map(DICT.flatMap { case (w, l) => Seq(lit(w), lit(l)) }: _*)
    transform(toks, t => coalesce(element_at(m, t), t))
  }
}
