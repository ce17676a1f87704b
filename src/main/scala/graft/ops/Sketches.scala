package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QuerySpec, Tables => T}
import graft.functions.Text

/** Sketch-based approximate analytics — the Spark twins of the reference's
  * streaming algorithms layer (SURVEY.md §2.5 A1–A10):
  *
  *  - Count-Min Sketch (count_min_sketch.py) → `org.apache.spark.util.sketch
  *    .CountMinSketch` via `df.stat.countMinSketch`, pinned to the
  *    reference's 544×7 table shape (A4; width=⌈e/0.005⌉, depth=⌈ln 1e3⌉);
  *  - Bloom filter (bloom_filter.py) → `org.apache.spark.util.sketch
  *    .BloomFilter` via `df.stat.bloomFilter` at the reference's defaults
  *    (100 000 capacity, 1% fpp ⇒ m=958 506 bits, k=7);
  *  - HLL (`approx_count_distinct`) as the scalable distinct-count path the
  *    reference lacked.
  *
  * Raw estimates are hash-family-specific, so no cross-engine oracle can
  * replay them — instead every registered query here emits the exact
  * columns both engines CAN compute plus the deterministic sketch
  * guarantees as booleans (compute-and-pin, the mm_meta_integrity
  * pattern), so the whole family is driver-hash-gated; the (ε,δ)
  * contracts are additionally enforced by ScalaTest/ScalaCheck property
  * specs against the exact twins (SURVEY.md §5.2). The one exception is
  * sketch_approx_quantiles (GK sketch merge is not order-invariant, and
  * its accuracy band is already pinned by sketch_quantile_contract —
  * converting it would register a byte-duplicate query). Sketch
  * aggregation is partial+final by construction (both sketches merge
  * exactly), so the build is one pass over the data at any scale.
  */
object Sketches {

  /** CMS probe report over TWO probe bands (A1/A2/A12 twin), driver-gated
    * (r11 verdict #2 — was rows-only: the raw estimates are
    * hash-family-internal, but the Count-Min guarantees per band are
    * deterministic for the pinned seed and dataset):
    *  - `present` band: the corpus top-20 tokens — exact ≤ est ≤ exact+ε·N
    *    (ε = 2/width for the 544-wide reference shape);
    *  - `absent` band: 10 synthetic never-inserted probes — est ≥ 0 and
    *    est ≤ ε·N (measured 0 at every fixture SF; absent-key collisions
    *    are what ε·N bounds). exact_cnt is computed from the data, not
    *    assumed 0, so a fixture that ever contained a probe token stays
    *    consistent in both engines.
    * This is the band the [[cmsContract]] gate does NOT cover (present
    * keys only); together they pin both sides of the CMS behavior. */
  private def cmsTokenFreq(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // persist: three actions (N, the CMS build, the exact counts) would
    // otherwise each re-scan + re-tokenize the corpus
    val toks = T.documents(s, d)
      .select(explode(Text.tokens(col("text"))).as("token"))
      .persist()
    val n = toks.count()
    // The oracle pins within_eps deterministically TRUE, but the CMS bound
    // est ≤ exact + ε·N only holds w.h.p. — per key, Pr[one row's collision
    // mass > ε·N] ≤ 1/2 (Markov at ε = 2/w), min over 7 rows ⇒ δ ≈ 2⁻⁷ per
    // key, a non-trivial ~20% chance over 30 probes that a testdata
    // REGENERATION re-rolls one key outside the band with no code change
    // (r12 ADVICE). Pin a 2·ε·N envelope instead: Markov at 2ε gives
    // (1/4)⁷ ≈ 6e-5 per key (~2e-3 per regeneration over both bands) while
    // still failing any actually-broken sketch by orders of magnitude; the
    // 1·ε·N guarantee itself stays measured in SketchSpec's property tests.
    val epsN = math.ceil(2.0 * n / 544).toLong
    // Reference shape: depth 7 × width 544, seed pinned (count_min_sketch.py:28-39)
    val cms = toks.stat.countMinSketch("token", 7, 544, 42)
    val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("exact_cnt"))
    val top = counts.orderBy(col("exact_cnt").desc, col("token")).limit(20)
      .withColumn("kind", lit("present"))
    val absent = (0 until 10).map(i => f"graftabsentprobe$i%02d").toDF("token")
      .join(counts, Seq("token"), "left")
      .select(col("token"), coalesce(col("exact_cnt"), lit(0L)).as("exact_cnt"))
      .withColumn("kind", lit("absent"))
    top.unionByName(absent)
      .withColumn("est",
        graft.functions.SketchProbes.cmsEstimate(s, cms, col("token")))
      .select(col("token"), col("kind"), col("exact_cnt"),
        (col("est") >= col("exact_cnt")).as("no_underestimate"),
        (col("est") <= col("exact_cnt") + lit(2 * epsN)).as("within_eps"))
      .orderBy(col("kind"), col("exact_cnt").desc, col("token"))
  }

  private val cmsAbsentProbesSql = (0 until 10)
    .map(i => f"SELECT 'graftabsentprobe$i%02d' AS token").mkString(" UNION ALL ")

  private val cmsTokenFreqSql =
    s"""WITH tc AS (
       |  SELECT token, count(*) AS exact_cnt
       |  FROM (SELECT unnest(${Text.toksSql}) AS token FROM documents)
       |  GROUP BY token),
       |top AS (SELECT token, 'present' AS kind, exact_cnt FROM tc
       |        ORDER BY exact_cnt DESC, token LIMIT 20),
       |ab AS (SELECT p.token, 'absent' AS kind,
       |         coalesce(tc.exact_cnt, CAST(0 AS BIGINT)) AS exact_cnt
       |       FROM ($cmsAbsentProbesSql) p LEFT JOIN tc USING (token))
       |SELECT token, kind, exact_cnt, TRUE AS no_underestimate,
       |  TRUE AS within_eps
       |FROM (SELECT * FROM top UNION ALL SELECT * FROM ab)
       |ORDER BY kind, exact_cnt DESC, token""".stripMargin

  /** Bloom-filter shingle dedup (ST5/A5 twin): build the filter over the
    * first half of the corpus (by doc_id), probe the second half's shingles
    * — the approximate version of text_dup_scores' first-half membership.
    *
    * Driver-gated per PROBED DOC (r11 verdict #2 — was rows-only): the
    * bloom membership count is hash-internal, but per doc
    *  - `n_shingles` / `n_true_seen` / `exact_score` / `is_dup_exact` are
    *    exact (true membership via join against the distinct history set —
    *    both engines compute them);
    *  - `no_false_negatives`: n_seen ≥ n_true_seen, structural (inserted
    *    bits stay set);
    *  - `fp_bounded`: n_seen − n_true_seen ≤ max(5, ⌈5%·n_shingles⌉) —
    *    measured 0 false positives per doc at every fixture SF, so the
    *    bound carries wide margin while still failing a broken filter. */
  private def bloomShingleDedup(s: SparkSession, d: String): DataFrame = {
    // persist: the shingle frame feeds two actions (bloom build, probe);
    // caching saves a full re-tokenize/re-shingle scan
    val sh = T.documents(s, d)
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(Text.shingles3(col("toks"))).as("sh"))
      .persist()
    // "first half" derived from the data, not a pinned constant — doc_ids
    // are dense from 0, so count()/2 is the median split at every scale
    // factor (500 docs at sf0.01, 5000 at sf0.1, …)
    val half = T.documents(s, d).count() / 2
    val history = sh.filter(col("doc_id") < half)
    val histSet = history.select(col("sh")).distinct().persist()
    // Size the filter to the data like the contract twin (r12 ADVICE): at
    // the reference's fixed 100 000 capacity (duplicate_detector.py:27-30)
    // a first half with more distinct shingles than that saturates the
    // filter and blows the pinned fp_bounded oracle at 10×/100× corpus
    // scale — count the inserts first and take max(100k, nIns) so the 1%
    // design fpp (and therefore the 5% pin) holds at any scale factor.
    // stat.bloomFilter over zero rows yields an unusable (null-buffer)
    // sketch; an empty history means nothing was ever seen.
    val nIns = histSet.count()
    val bloom =
      if (nIns == 0) null
      else history.stat.bloomFilter("sh", math.max(100000L, nIns), 0.01)
    val hist = histSet.withColumn("in_hist", lit(1))
    val score = round(col("n_true_seen").cast("double") / col("n_shingles"), 4)
    sh.filter(col("doc_id") >= half)
      .withColumn("seen",
        graft.functions.SketchProbes.bloomMightContain(s, bloom, col("sh")))
      .join(hist, Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("seen"), 1L).otherwise(0L)).as("n_seen"),
        sum(when(col("in_hist").isNotNull, 1L).otherwise(0L)).as("n_true_seen"))
      .select(col("doc_id"), col("n_shingles"), col("n_true_seen"),
        score.as("exact_score"),
        (score >= 0.7).as("is_dup_exact"),
        (col("n_seen") >= col("n_true_seen")).as("no_false_negatives"),
        (col("n_seen") - col("n_true_seen") <=
          greatest(lit(5L), ceil(col("n_shingles") * 0.05).cast("long")))
          .as("fp_bounded"))
      .orderBy(col("doc_id"))
  }

  private val bloomShingleDedupSql =
    s"""WITH shp AS (
       |  SELECT doc_id, unnest(${Text.shingles3Sql(Text.toksSql)}) AS sh
       |  FROM documents),
       |h AS (SELECT count(*) // 2 AS half FROM documents),
       |hist AS (SELECT DISTINCT sh FROM shp
       |         WHERE doc_id < (SELECT half FROM h)),
       |probe AS (
       |  SELECT p.doc_id, CASE WHEN hist.sh IS NOT NULL THEN 1 ELSE 0 END AS t
       |  FROM shp p LEFT JOIN hist ON p.sh = hist.sh
       |  WHERE p.doc_id >= (SELECT half FROM h))
       |SELECT doc_id, count(*) AS n_shingles,
       |  CAST(sum(t) AS BIGINT) AS n_true_seen,
       |  round(sum(t) * 1.0 / count(*), 4) AS exact_score,
       |  round(sum(t) * 1.0 / count(*), 4) >= 0.7 AS is_dup_exact,
       |  TRUE AS no_false_negatives, TRUE AS fp_bounded
       |FROM probe GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** HLL distinct tokens per snapshot (the scalable replacement for
    * A14's in-memory distinct set), driver-gated (r11 verdict #2 — was
    * rows-only): the HLL++ estimate is register-internal, but it is a
    * pure function of the merged register SET — independent of
    * partitioning and merge order (registers merge by max) — so
    * `merge_invariant` (the estimate under two different partitionings is
    * IDENTICAL) is deterministic TRUE and gates the aggregator's
    * partial+final merge path, the property the accuracy-band
    * [[hllContract]] does not cover. */
  private def hllDistinct(s: SparkSession, d: String): DataFrame = {
    val base = T.documents(s, d)
      .select(expr("doc_id div 100").as("snapshot"),
        explode(Text.tokens(col("text"))).as("token"))
    def approx(parts: Int) = base.repartition(parts).groupBy(col("snapshot"))
      .agg(approx_count_distinct(col("token"), 0.01).as(s"a$parts"))
    base.groupBy(col("snapshot"))
      .agg(countDistinct(col("token")).as("exact_distinct"))
      .join(approx(7), Seq("snapshot"))
      .join(approx(13), Seq("snapshot"))
      .select(col("snapshot"), col("exact_distinct"),
        (col("a7") === col("a13")).as("merge_invariant"))
      .orderBy(col("snapshot"))
  }

  private val hllDistinctSql =
    s"""SELECT doc_id // 100 AS snapshot,
       |  count(DISTINCT token) AS exact_distinct, TRUE AS merge_invariant
       |FROM (SELECT doc_id, unnest(${Text.toksSql}) AS token FROM documents)
       |GROUP BY snapshot ORDER BY snapshot""".stripMargin

  /** HLL accuracy contract, oracle-checkable: the approx value itself is
    * hash-family-internal (rows-only in sketch_hll_distinct), but whether
    * it lands inside the advertised error envelope is deterministic for a
    * fixed dataset — the HLL estimate is a pure function of the merged
    * register set, independent of partitioning or merge order. The oracle
    * asserts the exact column and `within_5pct = true` (rsd 0.01 ⇒ 5% is a
    * 5σ envelope); an estimate outside it fails the driver compare, giving
    * the sketch family a hard correctness gate alongside its property
    * specs. */
  private def hllContract(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(expr("doc_id div 100").as("snapshot"),
        explode(Text.tokens(col("text"))).as("token"))
      .groupBy(col("snapshot"))
      .agg(countDistinct(col("token")).as("exact_distinct"),
        approx_count_distinct(col("token"), 0.01).as("approx"))
      .select(col("snapshot"), col("exact_distinct"),
        (abs(col("approx") - col("exact_distinct")) <=
          col("exact_distinct") * lit(0.05)).as("within_5pct"))
      .orderBy(col("snapshot"))

  private val hllContractSql =
    s"""SELECT doc_id // 100 AS snapshot, count(DISTINCT token) AS exact_distinct,
       |  TRUE AS within_5pct
       |FROM (SELECT doc_id, unnest(${Text.toksSql}) AS token FROM documents)
       |GROUP BY snapshot ORDER BY snapshot""".stripMargin

  /** CMS accuracy contract, oracle-checkable (the [[hllContract]] pattern):
    * per-key estimates are hash-family-internal, but the Count-Min
    * guarantee — never undercounts, overcounts by at most ε·N — is
    * deterministic for a fixed seed and dataset (CMS counters are sums, so
    * the merged sketch is independent of partitioning and merge order).
    * ε = 2/width for the reference's 544-wide shape. The oracle asserts
    * the exact counts plus both contract booleans TRUE, hard-gating the
    * CMS family at driver compare time. */
  private def cmsContract(s: SparkSession, d: String): DataFrame = {
    // three actions (total count, sketch build, exact top-20): one scan
    val toks = T.documents(s, d)
      .select(explode(Text.tokens(col("text"))).as("token"))
      .persist()
    val n = toks.count()
    // 2·ε·N envelope, not 1·ε·N: the ε guarantee is only w.h.p. (δ ≈ 2⁻⁷
    // per key) and the oracle pins TRUE — see the cmsTokenFreq note; the
    // doubled band makes a regeneration-time spurious failure ~6e-5/key
    // while a broken sketch still overshoots by orders of magnitude.
    val epsN = math.ceil(2.0 * n / 544).toLong
    val cms = toks.stat.countMinSketch("token", 7, 544, 42)
    toks.groupBy(col("token")).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("token")).limit(20)
      .withColumn("est",
        graft.functions.SketchProbes.cmsEstimate(s, cms, col("token")))
      .select(col("token"), col("exact_cnt"),
        (col("est") >= col("exact_cnt")).as("no_underestimate"),
        (col("est") <= col("exact_cnt") + lit(2 * epsN)).as("within_eps"))
      .orderBy(col("exact_cnt").desc, col("token"))
  }

  private val cmsContractSql =
    s"""SELECT token, count(*) AS exact_cnt, TRUE AS no_underestimate,
       |  TRUE AS within_eps
       |FROM (SELECT unnest(${Text.toksSql}) AS token FROM documents)
       |GROUP BY token ORDER BY exact_cnt DESC, token LIMIT 20""".stripMargin

  /** Bloom-filter contract, oracle-checkable: membership bits are
    * hash-internal, but the filter's two guarantees are deterministic for
    * a fixed dataset — zero false negatives on inserted keys (structural:
    * inserted bits stay set), and a realized false-positive rate on
    * never-inserted keys within 5× the designed 1% (the filter is sized to
    * the data below, so the design fpp applies at every scale factor).
    * Ground-truth membership is an exact distinct/anti-join both engines
    * compute; the oracle asserts the exact counts plus both booleans. */
  private def bloomContract(s: SparkSession, d: String): DataFrame = {
    val sh = T.documents(s, d)
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(Text.shingles3(col("toks"))).as("sh"))
      .persist()
    val half = T.documents(s, d).count() / 2
    val inserted = sh.filter(col("doc_id") < half).select(col("sh")).distinct().persist()
    val nIns = inserted.count()
    // size to the data (≥ the reference's 100k default) so the 1% design
    // fpp holds at any scale factor, not just when n ≤ 100k.
    // Build from the persisted DISTINCT key set, not a second corpus-scale
    // pass over the raw shingle stream: inserting a key twice sets the
    // same bits, so the filter over distinct keys is bit-identical while
    // the build scans |distinct| rows from cache instead of replaying the
    // explode (r20, guide §1.2/§2.3 — decide/build on the small frame).
    val bloom = if (nIns == 0) null
      else inserted.stat.bloomFilter("sh", math.max(100000L, nIns), 0.01)
    def seen = graft.functions.SketchProbes.bloomMightContain(s, bloom, col("sh"))
    val nMissed = inserted.filter(!seen).count()
    // one aggregate pass computes (n_new, n_false_pos) together — the two
    // sequential count jobs each replayed the distinct + anti-join of the
    // never-inserted set (r20; the frame has exactly one consumer now, so
    // the persist is gone too). Legacy two-pass shape reachable for the
    // same-JVM A/B via -Dgraft.bloom.contract=legacy.
    val fresh = sh.filter(col("doc_id") >= half).select(col("sh")).distinct()
      .join(inserted, Seq("sh"), "left_anti")
    val (nNew, nFalsePos) =
      if (sys.props.get("graft.bloom.contract").contains("legacy")) {
        val f = fresh.persist(); val n = f.count(); val fp = f.filter(seen).count()
        f.unpersist(); (n, fp)
      } else {
        val r = fresh.agg(count(lit(1)), count(when(seen, lit(1)))).head
        (r.getLong(0), r.getLong(1))
      }
    val fpOk = nNew == 0 || nFalsePos.toDouble / nNew <= 0.05
    // every dependent count is materialized above and the result is a
    // driver-local literal — drop the cached frames now (same hygiene as
    // bloomFaithfulContract; direct callers outside the harnesses' per-
    // query clearCache would otherwise accumulate them, review finding)
    sh.unpersist(); inserted.unpersist()
    import s.implicits._
    Seq((nIns, nMissed == 0L, nNew, fpOk))
      .toDF("n_inserted", "zero_false_negatives", "n_new", "fp_rate_ok")
  }

  private val bloomContractSql =
    s"""WITH shp AS (
       |  SELECT doc_id, unnest(${Text.shingles3Sql(Text.toksSql)}) AS sh
       |  FROM documents),
       |h AS (SELECT count(*) // 2 AS half FROM documents),
       |inserted AS (
       |  SELECT DISTINCT sh FROM shp WHERE doc_id < (SELECT half FROM h)),
       |fresh AS (
       |  SELECT DISTINCT sh FROM shp WHERE doc_id >= (SELECT half FROM h)
       |    AND sh NOT IN (SELECT sh FROM inserted))
       |SELECT (SELECT count(*) FROM inserted) AS n_inserted,
       |  TRUE AS zero_false_negatives,
       |  (SELECT count(*) FROM fresh) AS n_new,
       |  TRUE AS fp_rate_ok""".stripMargin

  /** A6 twin via the custom [[graft.functions.BloomStatsAgg]] Aggregator:
    * corpus-wide Bloom stats with the fill ratio the built-in aggregation
    * cannot report. One partial+final pass per partitioning.
    *
    * Driver-gated (r11 verdict #2 — was rows-only): `bit_size` is a pure
    * constant of the pinned (capacity, fpp) sizing formula, `inserted` is
    * the exact shingle count both engines compute, and `merge_invariant`
    * pins the Aggregator's merge path: the filter merges by bitwise OR
    * and the insert counter by sum, so the full stats row under two
    * different partitionings is IDENTICAL — the property the formula-
    * consistency [[bloomStatsContract]] does not cover. The fill/fpp
    * VALUES stay reported through that contract's consistency booleans. */
  private def bloomStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sh = T.documents(s, d)
      .select(Text.tokens(col("text")).as("toks"))
      .select(explode(Text.shingles3(col("toks"))).as("sh"))
      .as[String]
    def statsOf(parts: Int) = sh.repartition(parts)
      .select(graft.functions.BloomStatsAgg.agg.toColumn).toDF()
    statsOf(7).select(col("bit_size"), col("set_bits").as("sb1"),
        col("inserted"), col("fill_ratio").as("fr1"), col("approx_fpp").as("fp1"))
      .crossJoin(statsOf(13).select(col("set_bits").as("sb2"),
        col("fill_ratio").as("fr2"), col("approx_fpp").as("fp2")))
      .select(col("bit_size"), col("inserted"),
        (col("sb1") === col("sb2") && col("fr1") === col("fr2") &&
          col("fp1") === col("fp2")).as("merge_invariant"))
  }

  private val bloomStatsSql =
    s"""SELECT CAST(${graft.functions.BloomStatsAgg.BIT_SIZE} AS BIGINT)
       |    AS bit_size,
       |  count(*) AS inserted, TRUE AS merge_invariant
       |FROM (SELECT unnest(${Text.shingles3Sql(Text.toksSql)}) AS sh
       |      FROM documents)""".stripMargin

  /** Bloom-stats contract, oracle-checkable (closes the last rows-only
    * sketch family without a dedicated contract): the fill ratio and fpp
    * are hash-internal VALUES, but the Aggregator's structural invariants
    * are deterministic booleans —
    *   - insert accounting: `inserted` equals the exact shingle count both
    *     engines compute (oracle-EXACT column, not a boolean);
    *   - popcount bound: k·n_distinct hash probes can set at most
    *     min(k·n_distinct, m) bits, and at least one bit per distinct key
    *     survives (zero-false-negative structure);
    *   - internal consistency: fill_ratio ≡ set_bits/m and
    *     approx_fpp ≡ fill_ratio^k to float precision (the A6 formulas,
    *     reference bloom_filter.py:65-73).
    * Partitioning/merge order cannot move any of these (merge is a bitwise
    * OR and an integer sum), so the booleans are deterministic per
    * dataset. */
  private def bloomStatsContract(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val K = 7 // hash count at the pinned dims (bloom_filter.py:28)
    val sh = T.documents(s, d)
      .select(Text.tokens(col("text")).as("toks"))
      .select(explode(Text.shingles3(col("toks"))).as("sh"))
      .persist()
    val nDistinct = sh.distinct().count()
    val stats = sh.as[String]
      .select(graft.functions.BloomStatsAgg.agg.toColumn).toDF()
    stats.select(
      col("inserted").as("n_inserted"),
      (col("set_bits") <= least(lit(K) * nDistinct, col("bit_size")) &&
        col("set_bits") >= lit(math.min(1L, nDistinct))).as("popcount_bounded"),
      (abs(col("fill_ratio") - col("set_bits") / col("bit_size")) < 1e-12)
        .as("fill_consistent"),
      (abs(col("approx_fpp") - pow(col("fill_ratio"), K)) < 1e-12)
        .as("fpp_consistent"))
  }

  private val bloomStatsContractSql =
    s"""SELECT count(*) AS n_inserted, TRUE AS popcount_bounded,
       |  TRUE AS fill_consistent, TRUE AS fpp_consistent
       |FROM (SELECT unnest(${Text.shingles3Sql(Text.toksSql)}) AS sh
       |      FROM documents)""".stripMargin

  /** Approximate quantiles (t-digest-style GK sketch, partial+final — the
    * 100 TB path rel_quantiles' scaladoc points at), oracle-exact via the
    * compute-and-pin pattern: Spark realizes the GK guarantee in RANK
    * terms — the estimate's realized rank interval [count(<est),
    * count(≤est)] must intersect [target − n/accuracy, target +
    * n/accuracy] — and the oracle pins the booleans TRUE alongside the
    * exact interpolated percentiles. Distinct from
    * sketch_quantile_contract, which pins the guarantee in VALUE terms
    * (percentile band + rel-err); together the two gate both faces of
    * the accuracy contract. One broadcast join of the ≤3-row estimate
    * frame back onto lineitem — two scans, no extra shuffle beyond the
    * two group-bys, scale-safe at any n. */
  private val quantileEstCache =
    scala.collection.concurrent.TrieMap.empty[String, Array[org.apache.spark.sql.Row]]

  private def approxQuantiles(s: SparkSession, d: String): DataFrame = {
    val li = T.lineitem(s, d).select(col("l_returnflag"), col("l_extendedprice"))
    val estPlan = li.groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("am"),
        expr("approx_percentile(l_extendedprice, 0.99, 10000)").as("ap"),
        count(lit(1)).as("n_rows"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("exact_median"),
        round(expr("percentile(l_extendedprice, 0.99)"), 4).as("exact_p99"))
    // |l_returnflag| = 3, so the estimate frame is bounded by construction:
    // collect it once per dataset (the faithfulCmsCache fit-once
    // convention) and re-literal it into the rank-check join — fusing the
    // GK agg under the join's BroadcastExchange measured 2.2 s steady vs
    // 0.4 s for the literal join at sf0.1 (the live-agg broadcast
    // serializes the whole est stage behind the broadcast wait)
    // L2: content-keyed ModelStore (r12 verdict #1) — the 3-row estimate
    // survives the JVM, so a warmup-skipped bench pays a file read
    val estRows = quantileEstCache.getOrElseUpdate(
      T.datasetKey(d, "lineitem"),
      graft.ModelStore.getOrFitSer(
        T.datasetKey(d, "lineitem"), "quantile_est")(estPlan.collect()))
    val est = s.createDataFrame(
      s.sparkContext.parallelize(estRows.toIndexedSeq, 1), estPlan.schema)
    val tol = ceil(col("n_rows") / lit(10000.0))
    li.join(broadcast(est), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"), col("n_rows"), col("exact_median"), col("exact_p99"))
      .agg(
        sum(when(col("l_extendedprice") < col("am"), 1L).otherwise(0L)).as("rk_lo_m"),
        sum(when(col("l_extendedprice") <= col("am"), 1L).otherwise(0L)).as("rk_hi_m"),
        sum(when(col("l_extendedprice") < col("ap"), 1L).otherwise(0L)).as("rk_lo_p"),
        sum(when(col("l_extendedprice") <= col("ap"), 1L).otherwise(0L)).as("rk_hi_p"))
      .select(col("l_returnflag"), col("n_rows"), col("exact_median"), col("exact_p99"),
        (col("rk_hi_m") >= col("n_rows") * 0.5 - tol &&
          col("rk_lo_m") <= col("n_rows") * 0.5 + tol).as("median_rank_ok"),
        (col("rk_hi_p") >= col("n_rows") * 0.99 - tol &&
          col("rk_lo_p") <= col("n_rows") * 0.99 + tol).as("p99_rank_ok"))
      .orderBy(col("l_returnflag"))
  }

  private val approxQuantilesSql =
    """SELECT l_returnflag, count(*) AS n_rows,
      |  round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_median,
      |  round(quantile_cont(l_extendedprice, 0.99), 4) AS exact_p99,
      |  TRUE AS median_rank_ok, TRUE AS p99_rank_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** approx_percentile accuracy contract, oracle-checkable (completes the
    * contract family): the GK-sketch estimate itself is
    * accuracy-internal (rows-only in sketch_approx_quantiles), but with
    * accuracy 10000 the guaranteed rank error is n/10000 ranks — far
    * inside a ±1-percentile band at any group size — so "the estimate
    * lands inside the exact [p−0.01, p+0.01] value band" is a
    * deterministic boolean both engines compute exactly.
    *
    * The `*_rel_err_ok` columns pin the ε claim in VALUE terms (r7
    * verdict stretch): |approx − exact| / exact ≤ 0.005, i.e. the rank
    * guarantee translated through the fixture's price density. Measured
    * worst case is 9.2e-4 (sf0.001 p99) and 1.5e-4 (sf0.01 median), so
    * the pin carries ~5× margin while staying an order of magnitude
    * tighter than the percentile band check. */
  private def quantileContract(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, 0.49)").as("lo50"),
        expr("percentile(l_extendedprice, 0.51)").as("hi50"),
        expr("percentile(l_extendedprice, 0.98)").as("lo99"),
        max(col("l_extendedprice")).as("mx"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("exact_median"),
        expr("percentile(l_extendedprice, 0.5)").as("em"),
        expr("percentile(l_extendedprice, 0.99)").as("ep"),
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("am"),
        expr("approx_percentile(l_extendedprice, 0.99, 10000)").as("ap"))
      .select(col("l_returnflag"), col("exact_median"),
        col("am").between(col("lo50"), col("hi50")).as("median_in_band"),
        col("ap").between(col("lo99"), col("mx")).as("p99_in_band"),
        (abs(col("am") - col("em")) / col("em") <= 0.005).as("median_rel_err_ok"),
        (abs(col("ap") - col("ep")) / col("ep") <= 0.005).as("p99_rel_err_ok"))
      .orderBy(col("l_returnflag"))

  private val quantileContractSql =
    """SELECT l_returnflag, round(quantile_cont(l_extendedprice, 0.5), 4)
      |    AS exact_median,
      |  TRUE AS median_in_band, TRUE AS p99_in_band,
      |  TRUE AS median_rel_err_ok, TRUE AS p99_rel_err_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ------------------------------------------------- hash-faithful twins
  //
  // The queries above ride Spark's built-in sketches: same (ε,δ) bounds as
  // the reference but a different hash family, so per-key estimates differ
  // (the r8 "missing #2" divergence). The sketch_*_faithful queries ride
  // graft.functions.RefSketches instead — the reference's blake2b/sha256
  // hashing reproduced byte-for-byte (goldens captured from Python hashlib,
  // SketchSpec) — so a reference user gets IDENTICAL per-key estimates and
  // membership bits, not merely the same bounds.

  /** Fit-once faithful CMS (seed 0, reference sizing 544×7) per dataset:
    * [[cmsFaithful]] and its contract twin build the IDENTICAL
    * deterministic sketch over the same token stream, so the blake2b
    * build — the dominant cost of both queries — runs once per JVM per
    * dataset (the pqModels/pcaModels/bucketedPair pattern). */
  private val faithfulCmsCache =
    scala.collection.concurrent.TrieMap.empty[String, graft.functions.RefSketches.RefCms]

  private def corpusTokens(s: SparkSession, d: String): DataFrame =
    T.documents(s, d).select(explode(Text.tokens(col("text"))).as("token"))

  private def faithfulCmsFor(s: SparkSession, d: String): graft.functions.RefSketches.RefCms = {
    import s.implicits._
    faithfulCmsCache.getOrElseUpdate(T.datasetKey(d, "documents"),
      graft.ModelStore.getOrFitSer(T.datasetKey(d, "documents"), "faithful_cms")(
        corpusTokens(s, d).as[String]
          .select(graft.functions.RefSketches.cmsAgg(0, 544, 7).toColumn).head()))
  }

  /** Faithful-CMS growth/monotonicity report for the corpus top-20 tokens
    * — [[cmsTokenFreq]]'s blake2b twin (seed 0, the reference constructor
    * default), driver-gated (r11 verdict #2 — was rows-only): per-key
    * estimates are blake2b-internal, but with the SAME seed a sketch over
    * the first corpus half and a sketch over the whole corpus hash every
    * key to the same cells, and CMS counters only grow under inserts, so
    *  - `half_no_underestimate`: est_half ≥ the exact first-half count
    *    (oracle-exact `exact_cnt_half` column);
    *  - `merge_monotone`: est_half ≤ est_full — the incremental-growth
    *    property a mergeable sketch deployment relies on (build per
    *    partition, merge up), which [[cmsFaithfulContract]]'s ε-band does
    *    not cover.
    * Both half sketches are fit-once cached like the full one. */
  private def cmsFaithful(s: SparkSession, d: String): DataFrame = {
    val full = faithfulCmsFor(s, d)
    val halfCms = faithfulCmsHalfFor(s, d)
    val half = T.documents(s, d).count() / 2
    val halfCounts = T.documents(s, d).filter(col("doc_id") < half)
      .select(explode(Text.tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("exact_cnt_half"))
    // native codegen'd probes (r12 verdict #7): 20-row post-limit frame,
    // so this buys shape uniformity (no ScalaUDF anywhere), not speed
    def estF(c: Column) = graft.functions.SketchProbes.refCmsEstimate(s, full, c)
    def estH(c: Column) = graft.functions.SketchProbes.refCmsEstimate(s, halfCms, c)
    corpusTokens(s, d).groupBy(col("token")).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("token")).limit(20)
      .join(halfCounts, Seq("token"), "left")
      .na.fill(0L, Seq("exact_cnt_half"))
      .select(col("token"), col("exact_cnt"), col("exact_cnt_half"),
        (estH(col("token")) >= col("exact_cnt_half")).as("half_no_underestimate"),
        (estH(col("token")) <= estF(col("token"))).as("merge_monotone"))
      .orderBy(col("exact_cnt").desc, col("token"))
  }

  private val cmsFaithfulSql =
    s"""WITH tc AS (
       |  SELECT token, count(*) AS exact_cnt
       |  FROM (SELECT unnest(${Text.toksSql}) AS token FROM documents)
       |  GROUP BY token),
       |th AS (
       |  SELECT token, count(*) AS c
       |  FROM (SELECT unnest(${Text.toksSql}) AS token FROM documents
       |        WHERE doc_id < (SELECT count(*) // 2 FROM documents))
       |  GROUP BY token),
       |top AS (SELECT token, exact_cnt FROM tc
       |        ORDER BY exact_cnt DESC, token LIMIT 20)
       |SELECT t.token, t.exact_cnt,
       |  coalesce(h.c, CAST(0 AS BIGINT)) AS exact_cnt_half,
       |  TRUE AS half_no_underestimate, TRUE AS merge_monotone
       |FROM top t LEFT JOIN th h USING (token)
       |ORDER BY exact_cnt DESC, token""".stripMargin

  /** Fit-once faithful CMS over the FIRST CORPUS HALF (doc_id < n/2) —
    * [[cmsFaithful]]'s growth-comparison sketch, cached per dataset like
    * the full one. */
  private val faithfulCmsHalfCache =
    scala.collection.concurrent.TrieMap.empty[String, graft.functions.RefSketches.RefCms]

  private def faithfulCmsHalfFor(s: SparkSession, d: String)
      : graft.functions.RefSketches.RefCms = {
    import s.implicits._
    faithfulCmsHalfCache.getOrElseUpdate(T.datasetKey(d, "documents"),
      graft.ModelStore.getOrFitSer(T.datasetKey(d, "documents"), "faithful_cms_half") {
        val half = T.documents(s, d).count() / 2
        T.documents(s, d).filter(col("doc_id") < half)
          .select(explode(Text.tokens(col("text"))).as("token")).as[String]
          .select(graft.functions.RefSketches.cmsAgg(0, 544, 7).toColumn).head()
      })
  }

  /** Faithful-CMS accuracy contract, oracle-checkable (the [[cmsContract]]
    * pattern, reference sizing): width=⌈e/ε⌉ ⇒ ε=e/width, so the Count-Min
    * guarantee is est ≤ exact + ⌈e·N/544⌉ with the reference's own bound. */
  private def cmsFaithfulContract(s: SparkSession, d: String): DataFrame = {
    val cms = faithfulCmsFor(s, d)
    val epsN = math.ceil(math.E * cms.total / 544).toLong
    def estimate(c: Column) =
      graft.functions.SketchProbes.refCmsEstimate(s, cms, c)
    corpusTokens(s, d).groupBy(col("token")).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("token")).limit(20)
      .withColumn("est", estimate(col("token")))
      .select(col("token"), col("exact_cnt"),
        (col("est") >= col("exact_cnt")).as("no_underestimate"),
        (col("est") <= col("exact_cnt") + lit(epsN)).as("within_eps"))
      .orderBy(col("exact_cnt").desc, col("token"))
  }

  /** Faithful-Bloom contract, oracle-checkable (the [[bloomContract]]
    * pattern through the reference's double-hash filter): zero false
    * negatives on inserted keys, realized fp rate on never-inserted keys
    * within 5× the 1% design. The aggregator's empty zero is a valid
    * all-bits-clear filter, so the empty-history path needs no null. */
  private def bloomFaithfulContract(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sh = T.documents(s, d)
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(Text.shingles3(col("toks"))).as("sh"))
      .persist()
    val half = T.documents(s, d).count() / 2
    val inserted = sh.filter(col("doc_id") < half).select(col("sh")).distinct().persist()
    val nIns = inserted.count()
    // build from the persisted DISTINCT key set (bit-identical: RefBloom
    // insert only ORs bits, and mightContain reads bits/m/k only — the
    // build-side `inserted` counter never reaches the output) instead of
    // replaying the corpus-scale explode a second time (r20, guide §2.3)
    val bloom = inserted.select(col("sh")).as[String]
      .select(graft.functions.RefSketches
        .bloomAgg(math.max(100000L, nIns), 0.01).toColumn).head()
    // corpus-sized probe scans through the codegen'd native expression —
    // same RefBloom.mightContain bits, no UDF boxing (r10 verdict #3)
    def seen = graft.functions.SketchProbes.refBloomMightContain(s, bloom, col("sh"))
    val nMissed = inserted.filter(!seen).count()
    // one fused (count, false-positive count) pass over the never-inserted
    // set — same rewrite as bloomContract; A/B via -Dgraft.bloom.contract
    val fresh = sh.filter(col("doc_id") >= half).select(col("sh")).distinct()
      .join(inserted, Seq("sh"), "left_anti")
    val (nNew, nFalsePos) =
      if (sys.props.get("graft.bloom.contract").contains("legacy")) {
        val f = fresh.persist(); val n = f.count(); val fp = f.filter(seen).count()
        f.unpersist(); (n, fp)
      } else {
        val r = fresh.agg(count(lit(1)), count(when(seen, lit(1)))).head
        (r.getLong(0), r.getLong(1))
      }
    val fpOk = nNew == 0 || nFalsePos.toDouble / nNew <= 0.05
    // every dependent count is materialized above and the returned frame is
    // a driver-local literal — unpersist here so direct callers (outside the
    // bench's per-query clearCache) don't leak the cached frames
    sh.unpersist()
    inserted.unpersist()
    Seq((nIns, nMissed == 0L, nNew, fpOk))
      .toDF("n_inserted", "zero_false_negatives", "n_new", "fp_rate_ok")
  }

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("sketch_cms_token_freq", cmsTokenFreq, Some(cmsTokenFreqSql)),
    QuerySpec("sketch_cms_faithful", cmsFaithful, Some(cmsFaithfulSql)),
    QuerySpec("sketch_cms_faithful_contract", cmsFaithfulContract, Some(cmsContractSql)),
    QuerySpec("sketch_bloom_faithful_contract", bloomFaithfulContract, Some(bloomContractSql)),
    QuerySpec("sketch_cms_contract", cmsContract, Some(cmsContractSql)),
    QuerySpec("sketch_bloom_dedup", bloomShingleDedup, Some(bloomShingleDedupSql)),
    QuerySpec("sketch_bloom_contract", bloomContract, Some(bloomContractSql)),
    QuerySpec("sketch_bloom_stats", bloomStats, Some(bloomStatsSql)),
    QuerySpec("sketch_bloom_stats_contract", bloomStatsContract, Some(bloomStatsContractSql)),
    QuerySpec("sketch_hll_distinct", hllDistinct, Some(hllDistinctSql)),
    QuerySpec("sketch_hll_contract", hllContract, Some(hllContractSql)),
    QuerySpec("sketch_approx_quantiles", approxQuantiles, Some(approxQuantilesSql)),
    QuerySpec("sketch_quantile_contract", quantileContract, Some(quantileContractSql)))
}
