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

  test("lemmatizer agreement with golden NLTK (default-noun WordNet) lemmas >= 0.95") {
    val dict = Lemmatizer.DICT.toMap
    val rows = goldenLines("/nltk_wordnet_lemmas.tsv").map(a => (a(0), a(1)))
    assert(rows.size >= 100, "golden lemma fixture unexpectedly small")
    val agree = rows.count { case (w, golden) =>
      dict.getOrElse(w, Lemmatizer.suffixLemma(w)) == golden
    }
    val ratio = agree.toDouble / rows.size
    info(f"lemma agreement: $agree/${rows.size} = $ratio%.3f")
    // History: r8 0.705 / r9 0.621 (adversarial fixture growth) under the
    // old verbal-stripping rules. r10 removed the -ing/-ed/-ied rules and
    // verbal DICT entries — the reference lemmatizes with NLTK's DEFAULT
    // pos (noun), which never touches verb inflections, so the verbal
    // handling WAS the divergence — added the public WordNet noun.exc
    // irregular plurals to DICT, and guarded non-[a-z] forms (morphy
    // returns dictionary misses unchanged): agreement 0.992 on 124 rows.
    // r12 expanded DICT with the remaining published noun.exc classes
    // (-i/-a/-ices/-ses/-ves/-men compounds + lice/dice/brethren) and grew
    // the fixture to 187 rows: agreement 0.995. The only remaining
    // disagreement is the pinned "axes" tie-break — asymptotically exact
    // short of shipping the WordNet index itself.
    assert(ratio >= 0.99,
      f"lemma agreement with NLTK golden fell to $ratio%.3f — a rule change " +
        "reopened a closed divergence class")
    // the fixture must still exercise a real divergence (axes, and any
    // future out-of-vocabulary plural rows): agreement is asymptotic, not
    // exact, without the WordNet index
    assert(ratio < 1.0, "fixture no longer exercises any divergent form")
  }

  test("tokenizer agreement with golden NLTK word_tokenize+isalpha >= 0.999 mean recall, 1.0 precision") {
    import spark.implicits._
    val rows = goldenLines("/nltk_punkt_tokens.tsv").map(a => (a(0), a(1)))
    assert(rows.size >= 10, "golden token fixture unexpectedly small")
    // the engine's T1+T2 tokenization with the stopword stage disabled —
    // stopword-list identity is pinned separately (TextSpec); this
    // isolates the TOKENIZER divergence. r10: edge-punct stripping lifted
    // mean recall 0.727 → 0.948; r13: the clitic strip (n't/'s/'re/'ve/
    // 'll/'d/'m split the way Treebank does, applied twice for double
    // contractions) lifted it to 0.994; r14: the Treebank FIXED word-list
    // contractions (cannot/gimme/gonna/gotta/lemme/wanna/d'ye/more'n/
    // 'tis/'twas — Text.WordSplits) closed the last rule-determined
    // class, including the latent PRECISION hazard where the engine
    // emitted fused forms ("cannot") NLTK never emits. Precision stays
    // exactly 1.0 (the engine never emits a token NLTK's
    // word_tokenize+isalpha would not — strips only recover stems/clean
    // words NLTK itself emits).
    val ours = rows.map(_._1).toDF("text")
      .select(graft.functions.Text.rawAlphaTokens(col("text")).as("toks"))
      .collect().map(_.getSeq[String](0))
    val (recalls, precisions) = ours.zip(rows.map(_._2.split(" ").toSeq)).map {
      case (mine, golden) =>
        val mineCounts = mine.groupBy(identity).map { case (k, v) => k -> v.size }
        val goldenCounts = golden.groupBy(identity).map { case (k, v) => k -> v.size }
        val hit = goldenCounts.map { case (k, v) =>
          math.min(v, mineCounts.getOrElse(k, 0))
        }.sum
        (hit.toDouble / golden.size,
          if (mine.isEmpty) 1.0 else hit.toDouble / mine.size)
    }.unzip
    val mean = recalls.sum / recalls.size
    val meanPrec = precisions.sum / precisions.size
    info(f"tokenizer mean recall vs NLTK golden: $mean%.3f, precision $meanPrec%.3f")
    assert(mean >= 0.999,
      f"tokenizer recall vs NLTK golden fell to $mean%.3f — a change " +
        "reopened a closed divergence class (clitic, word-list, or " +
        "edge-punct)")
    assert(meanPrec == 1.0,
      f"tokenizer precision vs NLTK golden fell to $meanPrec%.3f — the engine " +
        "emitted tokens NLTK would not (over-eager stripping or splitting)")
    // r14: every RULE-DETERMINED divergence class is closed, so the
    // fixture (which by documented policy excludes corpus-TRAINED Punkt
    // behavior — abbreviation periods, sentence-boundary models) now
    // agrees exactly; the lemma test above still pins a live divergence
    // ("axes"). The remaining real-world gap is Punkt's trained abbrev
    // handling ("dr." kept whole → dropped, where the engine strips the
    // period and keeps "dr"), untestable without the trained model and
    // excluded from the fixture for exactly that reason.
  }

  test("r10 divergence classes: engine behavior pinned per adversarial class") {
    import spark.implicits._
    val dict = Lemmatizer.DICT.toMap
    def engine(w: String) = dict.getOrElse(w, Lemmatizer.suffixLemma(w))
    // class 1 — latinate noun.exc plurals: CLOSED in r10 — the public
    // WordNet exception pairs are in DICT now
    assert(engine("corpora") == "corpus")
    assert(engine("matrices") == "matrix")
    assert(engine("analyses") == "analysis")
    assert(engine("oxen") == "ox")
    // class 2 — min-by-length: NLTK's lemmatize picks min(lemmas, key=len)
    // with the ORIGINAL form included, so an inflected form that is itself
    // a WordNet noun lemma comes back unchanged. data/men/media now agree;
    // "axes" stays the one DELIBERATE divergence (engine pins the
    // technical-corpus reading "axis"; NLTK's length tie-break says "ax").
    assert(engine("data") == "data")
    assert(engine("men") == "men")
    assert(engine("media") == "media")
    assert(engine("axes") == "axis") // golden: ax — pinned divergence
    // class 3/4 — hyphenated and unicode forms: CLOSED in r10 — the
    // non-[a-z] guard mirrors morphy returning dictionary misses unchanged
    assert(engine("data-sets") == "data-sets")
    assert(engine("cafés") == "cafés")
    // class 5 (NEW r10) — default-noun NLTK never strips verb inflections;
    // the engine's old -ing/-ed rules were the largest divergence class
    // and are gone
    assert(engine("running") == "running")
    assert(engine("joined") == "joined")
    assert(engine("tried") == "tried")
    // class 6 — out-of-vocabulary plurals remain inherently divergent:
    // without the WordNet index, rule 4 strips -s where NLTK would return
    // the unknown word unchanged
    assert(engine("flibbers") == "flibber") // NLTK (OOV): flibbers
    // class 7 — T2 predicate matches both its scaladoc and the
    // reference's Python isalpha (r8 verdict #4): unicode letters survive
    // tokenization, while attached punctuation and digit-bearing tokens
    // still drop
    val toks = Seq("Café naïve x1 don't WORD").toDF("text")
      .select(graft.functions.Text.tokens(col("text")).as("t"))
      .head().getSeq[String](0)
    assert(toks == Seq("café", "naïve", "word"))
  }
}
