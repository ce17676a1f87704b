package graft

import org.apache.spark.sql.functions._
import graft.functions.Lemmatizer

/** Quantifies the documented T1/T3 divergence (SURVEY §7.5, carried in every
  * verdict): the engine's whitespace+alpha tokenizer and dict+suffix-rule
  * lemmatizer are deterministic contracts, NOT emulations of NLTK's
  * Punkt/WordNet — these tests put a PINNED NUMBER on how far apart they
  * are, against committed golden files of expected NLTK behavior
  * (src/test/resources/nltk_*.tsv, provenance in the file headers: derived
  * from the published morphy/Treebank algorithms; NLTK itself is not
  * installable in this container).
  *
  * The bounds are floors a regression would trip (e.g. a tokenizer change
  * that starts dropping clean words, or a suffix rule that mangles regular
  * plurals), not targets: raising agreement toward 1.0 would require the
  * WordNet data files and a Punkt model, which is exactly the dependency
  * the engine's contract avoids.
  */
class NltkParitySpec extends SparkSpec {

  private def goldenLines(resource: String): Seq[Array[String]] = {
    val in = getClass.getResourceAsStream(resource)
    assert(in != null, s"missing golden fixture $resource")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines()
      .filterNot(l => l.startsWith("#") || l.trim.isEmpty)
      .map(_.split("\t")).toVector
    finally src.close()
  }

  test("lemmatizer agreement with golden NLTK (default-noun WordNet) lemmas >= 0.58") {
    val dict = Lemmatizer.DICT.toMap
    val rows = goldenLines("/nltk_wordnet_lemmas.tsv").map(a => (a(0), a(1)))
    assert(rows.size >= 100, "golden lemma fixture unexpectedly small")
    val agree = rows.count { case (w, golden) =>
      dict.getOrElse(w, Lemmatizer.suffixLemma(w)) == golden
    }
    val ratio = agree.toDouble / rows.size
    info(f"lemma agreement: $agree/${rows.size} = $ratio%.3f")
    // floor tracks fixture composition, not a target: r8 pinned 0.705 on
    // 105 rows (floor 0.65); r9 corrected two min-by-length entries
    // (data, men — ADVICE) and added 19 deliberately-adversarial rows
    // (latinate noun.exc plurals, min-by-length traps, hyphenated,
    // unicode), measuring 0.621 — the floor guards against a RULE
    // regression (~5 rows of margin), not against fixture growth
    assert(ratio >= 0.58,
      f"lemma agreement with NLTK golden fell to $ratio%.3f — a rule change " +
        "made the documented divergence materially worse")
    // the divergence is real, not an artifact of an over-friendly fixture:
    // the golden file must contain the known disagreement classes
    // (default-noun NLTK keeps -ing/-ed forms; the engine strips them)
    assert(ratio < 1.0, "fixture no longer exercises any divergent form")
  }

  test("tokenizer agreement with golden NLTK word_tokenize+isalpha >= 0.6 mean recall") {
    import spark.implicits._
    val rows = goldenLines("/nltk_punkt_tokens.tsv").map(a => (a(0), a(1)))
    assert(rows.size >= 10, "golden token fixture unexpectedly small")
    // the engine's T1+T2 tokenization (lowercase, whitespace split, alpha
    // filter) with the stopword stage disabled — stopword-list identity is
    // pinned separately (TextSpec); this isolates the TOKENIZER divergence
    val ours = rows.map(_._1).toDF("text")
      .select(filter(split(lower(col("text")), " "),
        t => t.rlike("^\\p{L}+$")).as("toks"))
      .collect().map(_.getSeq[String](0))
    val recalls = ours.zip(rows.map(_._2.split(" ").toSeq)).map {
      case (mine, golden) =>
        // multiset recall: how much of what NLTK keeps do we keep
        val mineCounts = mine.groupBy(identity).map { case (k, v) => k -> v.size }
        val hit = golden.groupBy(identity).map { case (k, v) =>
          math.min(v.size, mineCounts.getOrElse(k, 0))
        }.sum
        hit.toDouble / golden.size
    }
    val mean = recalls.sum / recalls.size
    info(f"tokenizer mean recall vs NLTK golden: $mean%.3f")
    assert(mean >= 0.6,
      f"tokenizer recall vs NLTK golden fell to $mean%.3f — whitespace+alpha " +
        "tokenization is dropping materially more than the documented " +
        "punctuation-adjacent words")
    assert(mean < 1.0, "fixture no longer exercises any divergent tokenization")
  }

  test("r9 divergence classes: engine behavior pinned per adversarial class") {
    import spark.implicits._
    val dict = Lemmatizer.DICT.toMap
    def engine(w: String) = dict.getOrElse(w, Lemmatizer.suffixLemma(w))
    // class 1 — latinate noun.exc plurals: NLTK resolves these via the
    // exception lists the engine deliberately does not carry; the engine
    // applies its suffix rules (or keeps the form). Golden column holds
    // corpus/matrix/analysis/ox.
    assert(engine("corpora") == "corpora")
    assert(engine("matrices") == "matrice")
    assert(engine("analyses") == "analyse")
    assert(engine("oxen") == "oxen")
    // class 2 — min-by-length: NLTK's lemmatize picks min(lemmas, key=len)
    // with the ORIGINAL form first, so an inflected form that is itself a
    // WordNet noun lemma comes back unchanged (data, men, media — ADVICE).
    // The engine's DICT pins data->datum: a now-documented divergence; men
    // and media agree with NLTK by rule coincidence.
    assert(engine("data") == "datum") // golden: data
    assert(engine("men") == "men")    // golden: men — agreement
    assert(engine("media") == "media") // golden: media — agreement
    // class 3 — hyphenated tokens: morphy finds no WordNet lemma so NLTK
    // keeps the form; the engine's bare suffix rule strips the plural 's'
    assert(engine("data-sets") == "data-set") // golden: data-sets
    // class 4 — unicode: no ASCII WordNet entry matches 'café', so NLTK
    // keeps 'cafés'; the engine strips to 'café'
    assert(engine("cafés") == "café") // golden: cafés
    // class 5 — T2 predicate now matches both its scaladoc and the
    // reference's Python isalpha (r8 verdict #4): unicode letters survive
    // tokenization, while attached punctuation and digit-bearing tokens
    // still drop
    val toks = Seq("Café naïve x1 don't WORD").toDF("text")
      .select(graft.functions.Text.tokens(col("text")).as("t"))
      .head().getSeq[String](0)
    assert(toks == Seq("café", "naïve", "word"))
  }
}
