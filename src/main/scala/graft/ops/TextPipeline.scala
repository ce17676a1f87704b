package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QuerySpec, Tables => T}
import graft.functions.Text

/** Exact relational twins of the reference pipeline (SURVEY.md §7.2 M0/M1),
  * re-expressed over the driver's `documents` table: the preprocessing chain,
  * token frequency analytics, check-then-insert shingle dedup, burst
  * detection over event-index windows, periodic snapshots, and probe
  * estimates. Where the reference mutates sketches per message
  * (run_detectors.py:159-211), these queries compute the same answers as
  * one-shuffle declarative aggregations — exact where the reference is
  * approximate (SURVEY.md §7.3: exact beats the sketch for correctness; the
  * sketch twins live in ops.Sketches).
  *
  * `doc_id` plays the role of the reference's arrival index (its stream is
  * pre-sorted by time, run_detectors.py:24-29); windows measured "in
  * messages" (DGIM window_size=50, half-window 25; snapshot cadence 100 —
  * streaming_pipeline.py:23, run_detectors.py:100-106) become integer-div
  * buckets of doc_id.
  */
object TextPipeline {

  private def docs(s: SparkSession, d: String): DataFrame =
    T.documents(s, d).select(col("doc_id"), col("text"), col("lang"),
      col("source"), col("n_chars"))

  private def withToks(s: SparkSession, d: String): DataFrame =
    docs(s, d).withColumn("toks", Text.tokens(col("text")))

  // ------------------------------------------------------------ preprocess

  /** F3–F5/T1–T5 twin: preprocessed body + token count per document. */
  private def preprocess(s: SparkSession, d: String): DataFrame =
    withToks(s, d)
      .select(col("doc_id"), array_join(col("toks"), " ").as("clean"),
        size(col("toks")).as("n_toks"))
      .orderBy(col("doc_id"))

  private val preprocessSql =
    s"""SELECT doc_id, array_to_string(${Text.toksSql}, ' ') AS clean,
       |  CAST(len(${Text.toksSql}) AS INT) AS n_toks
       |FROM documents ORDER BY doc_id""".stripMargin

  /** T3 twin: preprocessing with the explicit lemma dictionary applied
    * (map-literal transform in Spark ≡ CASE chain in the oracle —
    * graft.functions.Lemmatizer documents why a fixed dictionary, not
    * NLTK parity, is the contract). Stage order is the REFERENCE's
    * (base_dataset_loader.py:87-90): alpha-filter → LEMMATIZE → stopword
    * filter — so a token whose lemma is a stopword goes, and "does"
    * surfaces as WordNet's "doe" exactly like NLTK (r10 review finding:
    * the stages were inverted). */
  private def preprocessLemma(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(col("doc_id"), Text.rawAlphaTokens(col("text")).as("raw"))
      .select(col("doc_id"),
        array_join(graft.functions.Text.lemmaStopTokens(col("raw")), " ")
          .as("clean_lemma"))
      .orderBy(col("doc_id"))

  private val preprocessLemmaSql = {
    val caseChain = graft.functions.Lemmatizer.DICT
      .map { case (w, l) => s"WHEN t = '$w' THEN '$l'" }.mkString(" ")
    // dictionary CASE chain, falling back to the suffix-rule twin —
    // identical order to Lemmatizer.lemmatizeArray (dict hit wins);
    // lemma applied to the RAW alpha tokens, stopwords filtered after
    val fallback = graft.functions.Lemmatizer.suffixLemmaSql("t")
    s"""SELECT doc_id,
       |  array_to_string(list_filter(list_transform(${Text.rawAlphaToksSql},
       |    t -> CASE $caseChain ELSE $fallback END),
       |    t -> t NOT IN ${Text.stopwordsSqlList}), ' ') AS clean_lemma
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** T6/O3 twin + flagship: global top-20 tokens by exact count
    * (frequency_detector.py:69-80's top-N, exact instead of CMS-estimated).
    * explode → partial-agg groupBy → TakeOrdered: one shuffle, top-k merge
    * on the driver — scales to any corpus size. */
  private def topTokens(s: SparkSession, d: String): DataFrame =
    withToks(s, d)
      .select(explode(col("toks")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(20)

  private val topTokensSql =
    s"""SELECT token, count(*) AS cnt
       |FROM (SELECT unnest(${Text.toksSql}) AS token FROM documents)
       |GROUP BY token ORDER BY cnt DESC, token LIMIT 20""".stripMargin

  /** T7 twin: shingle inventory per document. */
  private def shingleStats(s: SparkSession, d: String): DataFrame =
    withToks(s, d)
      .withColumn("sh", Text.shingles3(col("toks")))
      .select(col("doc_id"), size(col("sh")).as("n_shingles"),
        size(array_distinct(col("sh"))).as("n_distinct"))
      .orderBy(col("doc_id"))

  private val shingleStatsSql = {
    val toks = Text.toksSql
    val sh = Text.shingles3Sql(toks)
    s"""SELECT doc_id, CAST(len(sh) AS INT) AS n_shingles,
       |  CAST(len(list_distinct(sh)) AS INT) AS n_distinct
       |FROM (SELECT doc_id, CASE WHEN len($toks) >= 3 THEN $sh ELSE [] END AS sh
       |      FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------ dedup twins

  /** Distinct (doc_id, shingle) pairs — shared subplan of the dup queries. */
  private def shinglePairs(s: SparkSession, d: String): DataFrame =
    withToks(s, d)
      .select(col("doc_id"), explode(Text.shingles3(col("toks"))).as("sh"))
      .distinct()

  private val shinglePairsSql = {
    val toks = Text.toksSql
    s"""SELECT DISTINCT doc_id, unnest(${Text.shingles3Sql(toks)}) AS sh
       |FROM documents""".stripMargin
  }

  /** ST5/F7/A11 twin — check-then-insert duplicate scoring
    * (duplicate_detector.py:52-61): a document's score is the fraction of
    * its distinct shingles already seen in any strictly-earlier document
    * (fidelity trap #1, SURVEY.md §7.4 — first sight never flags). One
    * shuffle on shingle for first-seen, one broadcast-able join back. */
  private def dupScores(s: SparkSession, d: String): DataFrame = {
    val pairs = shinglePairs(s, d)
    val firstSeen = pairs.groupBy(col("sh")).agg(min(col("doc_id")).as("first_doc"))
    val scores = pairs
      .join(firstSeen, "sh")
      .groupBy(col("doc_id"))
      .agg(round(avg(when(col("first_doc") < col("doc_id"), 1.0).otherwise(0.0)), 4)
        .as("dup_score"))
    docs(s, d).select(col("doc_id"))
      .join(scores, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("dup_score"), lit(0.0)).as("dup_score"))
      .withColumn("is_dup", col("dup_score") >= 0.7)
      .orderBy(col("doc_id"))
  }

  private val dupScoresSql =
    s"""WITH pairs AS ($shinglePairsSql),
       |first_seen AS (SELECT sh, min(doc_id) AS first_doc FROM pairs GROUP BY sh),
       |scores AS (
       |  SELECT pairs.doc_id,
       |    round(avg(CASE WHEN first_doc < pairs.doc_id THEN 1.0 ELSE 0.0 END), 4)
       |      AS dup_score
       |  FROM pairs JOIN first_seen USING (sh) GROUP BY pairs.doc_id)
       |SELECT d.doc_id, coalesce(s.dup_score, 0.0) AS dup_score,
       |  coalesce(s.dup_score, 0.0) >= 0.7 AS is_dup
       |FROM documents d LEFT JOIN scores s ON d.doc_id = s.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** A11 summary twin (run_detectors.py:233-237): corpus duplicate rate. */
  private def dupSummary(s: SparkSession, d: String): DataFrame =
    dupScores(s, d)
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup"),
        round(avg(when(col("is_dup"), 1.0).otherwise(0.0)), 4).as("dup_rate"),
        round(avg(col("dup_score")), 4).as("avg_score"))

  private val dupSummarySql =
    s"""WITH base AS ($dupScoresSql)
       |SELECT count(*) AS n_docs,
       |  CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       |  round(avg(CASE WHEN is_dup THEN 1.0 ELSE 0.0 END), 4) AS dup_rate,
       |  round(avg(dup_score), 4) AS avg_score
       |FROM base""".stripMargin

  // ------------------------------------------------------------ burst twin

  /** W2 twin — burst detection (burst_detector.py:43-77): token counts per
    * 25-doc half-window, ratio of a window vs the previous one (a silent
    * previous window counts zero) with the reference's ε=1e-6, flagged at
    * ratio ≥ 2 with ≥ 2 recent occurrences.
    *
    * Scale note: only rows with cnt ≥ 2 can flag, and `prev` only needs the
    * (token, win−1) count — so this is a sparse self-left-join of the
    * counts frame on (token, win−1), O(nnz) rows, NOT a dense
    * windows×vocabulary grid (which at 100× docs would materialize billions
    * of zero rows before the lag). Contract: an absent (token, win−1)
    * count coalesces to 0 — i.e. the comparison is always against the
    * IMMEDIATELY preceding window, counting a silent window as zero. (A
    * dense-grid lag over only the windows present in the data would
    * instead compare against the previous *existing* window when doc_ids
    * are gapped; doc_id is a gap-free sequence here, so the two agree on
    * this corpus, and the silent-window-counts-zero semantics is the
    * intended burst definition regardless.) */
  private def burst(s: SparkSession, d: String): DataFrame = {
    val tok = withToks(s, d)
      .select(expr("doc_id div 25").as("win"), explode(col("toks")).as("token"))
    val counts = tok.groupBy(col("win"), col("token")).agg(count(lit(1)).as("cnt"))
    val prev = counts.select((col("win") + 1).as("win"), col("token"),
      col("cnt").as("prev"))
    counts.join(prev, Seq("win", "token"), "left")
      .select(col("win"), col("token"), col("cnt"),
        coalesce(col("prev"), lit(0L)).as("prev"))
      .withColumn("ratio",
        round((col("cnt") + lit(1e-6)) / (col("prev") + lit(1e-6)), 4))
      .filter(col("cnt") >= 2 && col("ratio") >= 2.0)
      .select(col("win"), col("token"), col("cnt").as("recent"), col("prev"),
        col("ratio"))
      .orderBy(col("win"), col("token"))
  }

  private val burstSql =
    s"""WITH tok AS (
       |  SELECT doc_id // 25 AS win, unnest(${Text.toksSql}) AS token
       |  FROM documents),
       |counts AS (SELECT win, token, count(*) AS cnt FROM tok GROUP BY win, token),
       |scored AS (
       |  SELECT c.win, c.token, c.cnt, coalesce(p.cnt, 0) AS prev
       |  FROM counts c LEFT JOIN counts p
       |    ON p.token = c.token AND p.win = c.win - 1)
       |SELECT win, token, cnt AS recent, CAST(prev AS BIGINT) AS prev,
       |  round((cnt + 0.000001) / (prev + 0.000001), 4) AS ratio
       |FROM scored
       |WHERE cnt >= 2 AND round((cnt + 0.000001) / (prev + 0.000001), 4) >= 2.0
       |ORDER BY win, token""".stripMargin

  // ------------------------------------------------------------ snapshots

  /** ST4/O6/W1 twin — per-100-doc snapshot top-10 tokens, ranked by count
    * with first-occurrence (row_number) tie-break (bump_chart.py:16-19).
    *
    * Deliberate window (r16 de-windowing triage): the input is already
    * aggregated to (snapshot, token, cnt) — one row per distinct token
    * of a 100-doc slice, vocabulary-bounded regardless of corpus size —
    * and the rank<=10 filter plans as WindowGroupLimit, which prunes
    * each partition to its top 10 map-side before the exchange. */
  private def snapshotTopk(s: SparkSession, d: String): DataFrame = {
    val counts = withToks(s, d)
      .select(expr("doc_id div 100").as("snapshot"), explode(col("toks")).as("token"))
      .groupBy(col("snapshot"), col("token")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("snapshot"))
      .orderBy(col("cnt").desc, col("token"))
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("snapshot"), col("rank"), col("token"), col("cnt"))
      .orderBy(col("snapshot"), col("rank"))
  }

  private val snapshotTopkSql =
    s"""SELECT snapshot, CAST(rank AS INT) AS rank, token, cnt FROM (
       |  SELECT snapshot, token, cnt,
       |    row_number() OVER (PARTITION BY snapshot ORDER BY cnt DESC, token) AS rank
       |  FROM (SELECT doc_id // 100 AS snapshot, token, count(*) AS cnt
       |        FROM (SELECT doc_id, unnest(${Text.toksSql}) AS token FROM documents)
       |        GROUP BY snapshot, token))
       |WHERE rank <= 10 ORDER BY snapshot, rank""".stripMargin

  /** A12 twin — frequency probes for fixed query terms
    * (frequency_detector.py:89-93, case-folded on the probe side). Exact
    * counts; the CMS-estimated variant lives in ops.Sketches. */
  private def probeFreq(s: SparkSession, d: String): DataFrame = {
    val probes = Seq("spark", "data", "query", "table", "merge", "zzzmissing")
    // aggregate counts per token FIRST (one map-side-combined shuffle to
    // vocab size), then left-join the 6 probes onto the tiny result — the
    // old right-outer join put the broadcast hint on the preserved side,
    // which BroadcastHashJoin cannot build, so the whole exploded token
    // stream was shuffle-sorted against 6 rows (r10 review finding)
    val counts = withToks(s, d)
      .select(explode(col("toks")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("tok_cnt"))
    s.createDataFrame(probes.map(Tuple1(_))).toDF("term")
      .join(counts, lower(col("term")) === col("token"), "left")
      .select(col("term"), coalesce(col("tok_cnt"), lit(0L)).as("cnt"))
      .orderBy(col("term"))
  }

  private val probeFreqSql =
    s"""SELECT term, count(token) AS cnt
       |FROM (VALUES ('spark'), ('data'), ('query'), ('table'), ('merge'),
       |             ('zzzmissing')) p(term)
       |LEFT JOIN (SELECT unnest(${Text.toksSql}) AS token FROM documents) t
       |  ON lower(p.term) = t.token
       |GROUP BY term ORDER BY term""".stripMargin

  /** A14 twin — distinct tokens per snapshot window (the "recent token set"
    * cleared at each snapshot, run_detectors.py:179-180,210-211). */
  private def recentDistinct(s: SparkSession, d: String): DataFrame =
    withToks(s, d)
      .select(expr("doc_id div 100").as("snapshot"), explode(col("toks")).as("token"))
      .groupBy(col("snapshot"))
      .agg(countDistinct(col("token")).as("n_distinct"),
        count(lit(1)).as("n_tokens"))
      .orderBy(col("snapshot"))

  private val recentDistinctSql =
    s"""SELECT doc_id // 100 AS snapshot, count(DISTINCT token) AS n_distinct,
       |  count(*) AS n_tokens
       |FROM (SELECT doc_id, unnest(${Text.toksSql}) AS token FROM documents)
       |GROUP BY snapshot ORDER BY snapshot""".stripMargin

  /** End-to-end twin of the reference's final JSON summary
    * (run_detectors.py:227-243): one row with the whole run's headline
    * numbers — processed count, duplicate stats, vocabulary size, top
    * token, burst count. Composes the other twins' logic in one plan. */
  private def finalSummary(s: SparkSession, d: String): DataFrame = {
    val toksTbl = withToks(s, d)
    val tok = toksTbl.select(explode(col("toks")).as("token"))
    val top = tok.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(1)
      .select(lit(1).as("j"),
        col("token").as("top_token"), col("cnt").as("top_count"))
    // left-join the top-1 frame onto a 1-row seed: limit(1) over an
    // aggregate of a token-free corpus is EMPTY, and crossJoining an
    // empty frame would annihilate the whole summary row while the
    // oracle's scalar subqueries return one row with NULLs (r10 review
    // finding)
    val top1 = s.range(1).select(lit(1).as("j"))
      .join(top, Seq("j"), "left").drop("j")
    val vocab = tok.agg(countDistinct(col("token")).as("n_distinct_tokens"),
      count(lit(1)).as("n_tokens"))
    val dups = dupScores(s, d)
      .agg(count(lit(1)).as("n_processed"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dups"),
        round(avg(col("dup_score")), 4).as("avg_dup_score"))
    val bursts = burst(s, d).agg(count(lit(1)).as("n_bursts"))
    dups.crossJoin(vocab).crossJoin(top1).crossJoin(bursts)
  }

  private val finalSummarySql =
    s"""WITH dup AS ($dupScoresSql),
       |tok AS (SELECT unnest(${Text.toksSql}) AS token FROM documents),
       |burstq AS ($burstSql)
       |SELECT
       |  (SELECT count(*) FROM dup) AS n_processed,
       |  (SELECT CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) FROM dup) AS n_dups,
       |  (SELECT round(avg(dup_score), 4) FROM dup) AS avg_dup_score,
       |  (SELECT count(DISTINCT token) FROM tok) AS n_distinct_tokens,
       |  (SELECT count(*) FROM tok) AS n_tokens,
       |  (SELECT token FROM tok GROUP BY token ORDER BY count(*) DESC, token LIMIT 1) AS top_token,
       |  (SELECT count(*) FROM tok GROUP BY token ORDER BY count(*) DESC, token LIMIT 1) AS top_count,
       |  (SELECT count(*) FROM burstq) AS n_bursts""".stripMargin

  /** Untimed warmup hook (graft.Warmup): run the real
    * tokenize→explode→groupBy→window top-k shape (the `snapshotTopk` plan)
    * over a small slice so its first-use cost — tokenizer/window expression
    * codegen, WindowExec first use, interpreter→JIT ramp of the token hot
    * loop — is absorbed before the timed loop. 2048 docs is enough token
    * iterations to JIT at negligible cost (same sizing as
    * Multimodal.warmDecode). */
  def warmTokenWindow(s: SparkSession, d: String): Unit = {
    val counts = docs(s, d).limit(2048)
      .withColumn("toks", Text.tokens(col("text")))
      .select(expr("doc_id div 100").as("snapshot"), explode(col("toks")).as("token"))
      .groupBy(col("snapshot"), col("token")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("snapshot"))
      .orderBy(col("cnt").desc, col("token"))
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10).count()
    ()
  }

  // ----------------------------------------------------- S5: plot sink

  /** S5 — the bump-chart PLOT SINK (`/root/reference/plot/bump_chart.py:
    * 87-104`), closing the one §2 row that had stayed rank-table-only:
    * the snapshot-rank trajectories rendered as a deterministic SVG. SVG
    * is pure string construction, so unlike a matplotlib PNG the RENDERED
    * BYTES are oracle-checkable — the DuckDB twin rebuilds the identical
    * element strings from the same rank table (the scc_loader_report
    * `toJSON`-replay discipline applied to a plot). Geometry is all
    * integer arithmetic (x = 40 + 60·snapshot, y = 20 + 24·rank), so both
    * engines render byte-identical coordinates; tokens are `\p{L}+` so no
    * XML escaping is needed by construction. Rows are (kind, svg) —
    * 0 header, 1 x-axis labels, 2 one polyline+label per token, 3 footer
    * — and [[writeBumpChart]] assembles them into the actual .svg file
    * (the sink form; the file content is exactly these rows in order).
    * Row count is bounded: 2 + #snapshots + ≤10·#snapshots tokens. */
  private[graft] def bumpChartSvg(s: SparkSession, d: String): DataFrame = {
    val ranks = snapshotTopk(s, d)
    // coalesce: an EMPTY rank table (empty corpus) makes max(snapshot)
    // NULL, which would concat to a NULL svg row — and Spark sorts NULLs
    // first while the DuckDB twin sorts NULLS LAST, so the twins would
    // diverge AND writeBumpChart would print the literal "null". With the
    // 0-width fallback (mirrored in the SQL twin) the empty-corpus output
    // is a well-formed empty chart in both engines.
    val header = ranks.agg(coalesce(max(col("snapshot")), lit(0L)).as("mx"))
      .select(lit(0).as("kind"),
        concat(lit("<svg xmlns=\"http://www.w3.org/2000/svg\" width=\""),
          (col("mx") * 60 + 240).cast("string"),
          lit("\" height=\"300\">")).as("svg"))
    val axis = ranks.select(col("snapshot")).distinct()
      .select(lit(1).as("kind"),
        concat(lit("<text x=\""), (col("snapshot") * 60 + 40).cast("string"),
          lit("\" y=\"290\">s"), col("snapshot").cast("string"),
          lit("</text>")).as("svg"))
    val polys = ranks
      .groupBy(col("token"))
      .agg(sort_array(collect_list(struct(col("snapshot"), col("rank")))).as("pts"))
      .select(lit(2).as("kind"), concat(
        lit("<polyline fill=\"none\" stroke=\"#4878a8\" stroke-width=\"2\" points=\""),
        array_join(transform(col("pts"), p =>
          concat((p.getField("snapshot") * 60 + 40).cast("string"), lit(","),
            (p.getField("rank") * 24 + 20).cast("string"))), " "),
        lit("\"/><text x=\""),
        (element_at(col("pts"), -1).getField("snapshot") * 60 + 46).cast("string"),
        lit("\" y=\""),
        (element_at(col("pts"), -1).getField("rank") * 24 + 24).cast("string"),
        lit("\">"), col("token"), lit("</text>")).as("svg"))
    val footer = s.range(1).select(lit(3).as("kind"), lit("</svg>").as("svg"))
    header.unionByName(axis).unionByName(polys).unionByName(footer)
      .orderBy(col("kind"), col("svg"))
  }

  private val bumpChartSvgSql = {
    val rt =
      s"""SELECT snapshot, CAST(rank AS INT) AS rank, token FROM (
         |  SELECT snapshot, token, cnt,
         |    row_number() OVER (PARTITION BY snapshot
         |      ORDER BY cnt DESC, token) AS rank
         |  FROM (SELECT doc_id // 100 AS snapshot, token, count(*) AS cnt
         |        FROM (SELECT doc_id, unnest(${Text.toksSql}) AS token
         |              FROM documents)
         |        GROUP BY snapshot, token))
         |WHERE rank <= 10""".stripMargin
    s"""WITH rt AS ($rt),
       |hdr AS (SELECT 0 AS kind,
       |  '<svg xmlns="http://www.w3.org/2000/svg" width="' ||
       |  (coalesce(max(snapshot), 0)*60 + 240) || '" height="300">' AS svg FROM rt),
       |axis AS (SELECT DISTINCT 1 AS kind,
       |  '<text x="' || (snapshot*60 + 40) || '" y="290">s' || snapshot
       |  || '</text>' AS svg FROM rt),
       |poly AS (SELECT 2 AS kind,
       |  '<polyline fill="none" stroke="#4878a8" stroke-width="2" points="' ||
       |  string_agg((snapshot*60 + 40) || ',' || (rank*24 + 20), ' '
       |    ORDER BY snapshot) ||
       |  '"/><text x="' || (max(snapshot)*60 + 46) || '" y="' ||
       |  (arg_max(rank, snapshot)*24 + 24) || '">' || token || '</text>' AS svg
       |  FROM rt GROUP BY token),
       |ftr AS (SELECT 3 AS kind, '</svg>' AS svg)
       |SELECT kind, svg FROM (
       |  SELECT * FROM hdr UNION ALL SELECT * FROM axis
       |  UNION ALL SELECT * FROM poly UNION ALL SELECT * FROM ftr)
       |ORDER BY kind, svg""".stripMargin
  }

  /** The sink itself: renders the chart rows to `path` as a complete .svg
    * file. The collected frame is bounded by construction (≤ 2 +
    * 11·#snapshots rows); a real deployment would emit per-partition
    * fragments the same way the reference's matplotlib call is a single
    * driver-side figure. */
  def writeBumpChart(s: SparkSession, d: String, path: String): Unit = {
    val rows = bumpChartSvg(s, d).collect().map(_.getString(1))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      rows.mkString("", "\n", "\n"))
  }

  // ------------------------------------------- tokenizer torture parity

  /** Adversarial tokenizer-parity corpus: every divergence class the
    * golden-NLTK fixture ever exercised, PLUS the regex-dialect traps the
    * twins are documented to sidestep (\A/\z vs ^/$ on newline-bearing
    * tokens, RLIKE find-semantics, curly/unicode punctuation, the fixed
    * Treebank word list, double clitics, near-miss non-splits). One
    * shared literal drives BOTH engines — the Spark frame and the DuckDB
    * VALUES clause are generated from this Seq, so the two sides cannot
    * drift — and the driver's hash compare re-proves tokenizer parity
    * every round on inputs far nastier than the corpus. */
  private[graft] val TortureStrings: Seq[String] = Seq(
    "You cannot wire the money, gotta stop now.",
    "d'ye wanna meet the lawyer tomorrow?",
    "he said 'twas a scam; 'tis true — lemme check, gimme the details",
    "that costs more'n the lawyer said it would",
    "she'd've sent it; don't worry, it's fine!",
    "cannothing scannot wannabe gottan (cannot)",
    "«café» “naïve” ‘word’ — results… pending",
    "UPPER MiXeD lower", // case folding before everything
    "a  b   c", // runs of spaces -> empty split cells, filtered
    "", // empty document
    "...", "?!—–…", // punctuation-only tokens
    "trailing newline\n", "mid\nline token", // the \A\z-vs-^$ trap rows
    "word, word. word! word? (word) [word] {word}",
    "can't won't shan't ain't y'all'd've", // clitic chains incl. triple
    "o'clock rock'n'roll 1990's x1 e.g. file.txt and/or",
    "don't,  “don't”, (don't!)", // clitic + wrapping punct combos
    "tis twas more'n. d'ye? gonna! wanna,") // word-list forms wearing punct

  private def tokenizerTorture(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    TortureStrings.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("sid", "text")
      .select(col("sid"), Text.tokens(col("text")).as("toks"))
      .select(col("sid"),
        array_join(col("toks"), " ").as("toks_joined"),
        size(col("toks")).cast("long").as("n_toks"))
      .orderBy(col("sid"))
  }

  private val tokenizerTortureSql: String = {
    val values = TortureStrings.zipWithIndex.map { case (t, i) =>
      s"($i, '${t.replace("'", "''")}')"
    }.mkString(", ")
    // coalesce: DuckDB's array_to_string is NULL on an EMPTY list where
    // Spark's array_join is '' — the zero-token torture rows exist to
    // pin exactly this kind of dialect edge
    s"""WITH t(sid, text) AS (VALUES $values)
       |SELECT sid, coalesce(array_to_string(toks, ' '), '') AS toks_joined,
       |  CAST(len(toks) AS BIGINT) AS n_toks
       |FROM (SELECT sid, ${Text.toksSql} AS toks FROM t)
       |ORDER BY sid""".stripMargin
  }

  // ------------------------------------------------------------ registry

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("text_tokenizer_torture", tokenizerTorture, Some(tokenizerTortureSql)),
    QuerySpec("text_bump_chart_svg", bumpChartSvg, Some(bumpChartSvgSql)),
    QuerySpec("text_preprocess", preprocess, Some(preprocessSql)),
    QuerySpec("text_preprocess_lemma", preprocessLemma, Some(preprocessLemmaSql)),
    QuerySpec("text_top_tokens", topTokens, Some(topTokensSql)),
    QuerySpec("text_shingle_stats", shingleStats, Some(shingleStatsSql)),
    QuerySpec("text_dup_scores", dupScores, Some(dupScoresSql)),
    QuerySpec("text_dup_summary", dupSummary, Some(dupSummarySql)),
    QuerySpec("text_burst", burst, Some(burstSql)),
    QuerySpec("text_snapshot_topk", snapshotTopk, Some(snapshotTopkSql)),
    QuerySpec("text_probe_freq", probeFreq, Some(probeFreqSql)),
    QuerySpec("text_recent_distinct", recentDistinct, Some(recentDistinctSql)),
    QuerySpec("text_final_summary", finalSummary, Some(finalSummarySql)))
}
