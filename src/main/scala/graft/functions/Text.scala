package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-preprocessing column builders — the Spark twins of the reference's
  * preprocessing chain (lowercase → tokenize → alpha filter → stopword
  * removal → re-join; /root/reference/data_loader/base_dataset_loader.py:80-91)
  * and shingling (/root/reference/streaming/detectors/duplicate_detector.py:7-13).
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * higher-order functions — no UDFs — so the whole chain stays inside
  * WholeStageCodegen and scales linearly with input bytes.
  */
object Text {

  /** Compact deterministic stopword set (reference uses NLTK's list ∪
    * skipwords, base_dataset_loader.py:12-14; we pin an explicit list so the
    * DuckDB oracle can carry the identical literal). */
  val STOPWORDS: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** SQL literal of the stopword list, for oracle strings. */
  val stopwordsSqlList: String = STOPWORDS.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Preprocessed token array: lowercase, whitespace-split, alpha-only
    * (unicode-safe `\p{L}`, matching Python `str.isalpha`), stopwords out. */
  def tokens(text: Column): Column =
    filter(
      split(lower(text), " "),
      t => t.rlike("^[a-z]+$") && !t.isInCollection(STOPWORDS))

  /** k=3 shingles joined by spaces (duplicate_detector.py:7-13): the i-th
    * shingle is tokens[i..i+2]; fewer than 3 tokens → no shingles.
    *
    * PERFORMANCE: pass a PROJECTED column (`.select(tokens(col("text"))
    * .as("toks"))` first, then `shingles3(col("toks"))`), never the nested
    * `shingles3(tokens(col("text")))`. The `toks` expression appears inside
    * the transform lambda, where codegen re-evaluates it per array element —
    * nesting the tokenizer (a per-token regex) there turns an O(n) row into
    * O(n²) regex calls (measured 12× slower at sf0.1). */
  def shingles3(toks: Column): Column =
    when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2),
        i => array_join(slice(toks, i, lit(3)), " ")))
      .otherwise(typedLit(Seq.empty[String]))

  /** General k-shingles (same contract as [[shingles3]]: pass a PROJECTED
    * toks column, never the nested tokenizer — see the warning above). */
  def shinglesK(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => array_join(slice(toks, i, lit(k)), " ")))
      .otherwise(typedLit(Seq.empty[String]))

  def shinglesKSql(toksExpr: String, k: Int): String =
    s"list_transform(range(1, len($toksExpr) - ${k - 2}), i -> array_to_string(($toksExpr)[i:i+${k - 1}], ' '))"

  /** DuckDB oracle fragments mirroring the builders above, verbatim. */
  val toksSql: String =
    s"list_filter(string_split(lower(text), ' '), t -> regexp_full_match(t, '[a-z]+') AND t NOT IN ${stopwordsSqlList})"

  def shingles3Sql(toksExpr: String): String =
    s"list_transform(range(1, len($toksExpr) - 1), i -> array_to_string(($toksExpr)[i:i+2], ' '))"
}
