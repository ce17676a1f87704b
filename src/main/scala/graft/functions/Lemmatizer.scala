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

  // -------------------------------------------------------- suffix rules
  //
  // Fallback for words the dictionary misses: a deterministic
  // approximation of WordNet morphy's common suffix paths (plural
  // stripping; -ing/-ed with consonant undoubling). Three lockstep
  // implementations — plain Scala (UDF), Column (codegen), SQL string
  // (DuckDB oracle) — kept byte-equivalent by the shared rule order
  // below; the oracle gate verifies parity on the full corpus each round.
  //
  //  1. *ies, len>4        → -ies +y     (parties → party)
  //  2. *ied, len>4        → -ied +y     (carried → carry, tried → try)
  //  3. *ches|shes|xes|zes|sses → -es    (boxes → box, classes → class)
  //  4. *ss                → unchanged   (class, less)
  //  5. *s, len>3, not *us/*is → -s      (runs → run; bonus, basis stay)
  //  6. *ing, len>5        → -ing, undouble (running → run, reading → read)
  //  7. *ed, len>4, not *eed → -ed, undouble (stopped → stop, joined → join;
  //                                          speed/need/indeed stay — 'eed'
  //                                          is almost never a past tense)
  //
  // Undoubling drops the final char when the base ends in a doubled
  // consonant. Rules 6/7 do NOT restore a dropped 'e' (merging → merg):
  // that path needs dictionary knowledge, which is what DICT is for.

  private val CONSONANTS = "bcdfghjklmnpqrstvwxz"

  /** Plain-Scala rule (UDF + tests). */
  def suffixLemma(t: String): String = {
    def undouble(b: String): String =
      if (b.length >= 2 && b(b.length - 1) == b(b.length - 2) &&
        CONSONANTS.contains(b(b.length - 1))) b.init
      else b
    if (t.endsWith("ies") && t.length > 4) t.dropRight(3) + "y"
    else if (t.endsWith("ied") && t.length > 4) t.dropRight(3) + "y"
    else if (Seq("ches", "shes", "xes", "zes", "sses").exists(t.endsWith)) t.dropRight(2)
    else if (t.endsWith("ss")) t
    else if (t.endsWith("s") && t.length > 3 && !t.endsWith("us") && !t.endsWith("is"))
      t.dropRight(1)
    else if (t.endsWith("ing") && t.length > 5) undouble(t.dropRight(3))
    else if (t.endsWith("ed") && t.length > 4 && !t.endsWith("eed")) undouble(t.dropRight(2))
    else t
  }

  /** Column twin (stays inside codegen — when-chain over string builtins). */
  def suffixLemmaCol(t: Column): Column = {
    def drop(n: Int): Column = t.substr(lit(1), length(t) - n)
    def undouble(b: Column): Column =
      when(substring(b, -1, 1) === substring(b, -2, 1) &&
        substring(b, -1, 1).rlike(s"[$CONSONANTS]"),
        b.substr(lit(1), length(b) - 1)).otherwise(b)
    when(t.endsWith("ies") && length(t) > 4, concat(drop(3), lit("y")))
      .when(t.endsWith("ied") && length(t) > 4, concat(drop(3), lit("y")))
      .when(t.endsWith("ches") || t.endsWith("shes") || t.endsWith("xes") ||
        t.endsWith("zes") || t.endsWith("sses"), drop(2))
      .when(t.endsWith("ss"), t)
      .when(t.endsWith("s") && length(t) > 3 &&
        !t.endsWith("us") && !t.endsWith("is"), drop(1))
      .when(t.endsWith("ing") && length(t) > 5, undouble(drop(3)))
      .when(t.endsWith("ed") && length(t) > 4 && !t.endsWith("eed"), undouble(drop(2)))
      .otherwise(t)
  }

  /** DuckDB twin of [[suffixLemmaCol]]; `e` must be a bare column/lambda
    * variable reference (it is repeated many times). */
  def suffixLemmaSql(e: String): String = {
    def undouble(b: String): String =
      s"""CASE WHEN substr($b, len($b), 1) = substr($b, len($b) - 1, 1)
         | AND substr($b, len($b), 1) IN (${CONSONANTS.map(c => s"'$c'").mkString(", ")})
         | THEN substr($b, 1, len($b) - 1) ELSE $b END""".stripMargin.replaceAll("\n", "")
    s"""CASE
       | WHEN $e LIKE '%ies' AND len($e) > 4 THEN substr($e, 1, len($e) - 3) || 'y'
       | WHEN $e LIKE '%ied' AND len($e) > 4 THEN substr($e, 1, len($e) - 3) || 'y'
       | WHEN $e LIKE '%ches' OR $e LIKE '%shes' OR $e LIKE '%xes'
       |   OR $e LIKE '%zes' OR $e LIKE '%sses' THEN substr($e, 1, len($e) - 2)
       | WHEN $e LIKE '%ss' THEN $e
       | WHEN $e LIKE '%s' AND len($e) > 3 AND $e NOT LIKE '%us' AND $e NOT LIKE '%is'
       |   THEN substr($e, 1, len($e) - 1)
       | WHEN $e LIKE '%ing' AND len($e) > 5 THEN ${undouble(s"substr($e, 1, len($e) - 3)")}
       | WHEN $e LIKE '%ed' AND len($e) > 4 AND $e NOT LIKE '%eed'
       |   THEN ${undouble(s"substr($e, 1, len($e) - 2)")}
       | ELSE $e END""".stripMargin.replaceAll("\n", "")
  }

  /** Broadcast-map scalar UDF: lemma(token). */
  def lemmaUdf(s: SparkSession): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val bc = s.sparkContext.broadcast(DICT.toMap)
    udf((t: String) => if (t == null) null else bc.value.getOrElse(t, suffixLemma(t)))
  }

  /** Declarative form: explode-join-coalesce over a broadcast lemma dim.
    * `df` must carry (rowId, token); returns (rowId, token=lemma'd). */
  def lemmatizeTokens(s: SparkSession, df: DataFrame, tokenCol: String): DataFrame = {
    import s.implicits._
    val dict = DICT.toDF("word", "lemma")
    df.join(broadcast(dict), df(tokenCol) === col("word"), "left")
      .withColumn(tokenCol, coalesce(col("lemma"), suffixLemmaCol(df(tokenCol))))
      .drop("word", "lemma")
  }

  /** Column form for array columns: transform via a map literal. */
  def lemmatizeArray(toks: Column): Column = {
    val m = map(DICT.flatMap { case (w, l) => Seq(lit(w), lit(l)) }: _*)
    transform(toks, t => coalesce(element_at(m, t), suffixLemmaCol(t)))
  }
}
