package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QuerySpec, Tables => T}

/** Multimodal-column plumbing (builder-prompt first-class component): media
  * as opaque `BinaryType` columns with typed metadata, and partition-wise
  * batched feature extraction — the Scala analogue of a Pandas-UDF
  * `mapInPandas` decode stage.
  *
  * The decode stage runs the REAL pure-JVM [[PgmCodec]] (binary netpbm
  * PGM): each payload is deterministically wrapped as a P5 image and then
  * actually parsed, so every emitted feature is integer arithmetic over a
  * real decoded raster and the DuckDB oracle re-derives it exactly from
  * the payload bytes (r7 verdict #5 — the earlier FakeDecoder stub is
  * retired; its only surviving role, "codecs the container lacks need
  * native libs", is documented on the [[Codec]] trait, whose JNI
  * implementations slot into the same batched loop). Everything around the
  * codec is real and tested: the binary schema, the
  * `Dataset[MediaRecord]` encoder, partition-wise batching (bounded memory
  * per batch, the shape a vectorized decode needs), and the feature
  * schema.
  *
  * Source data: the `documents` table's text bytes stand in for media blobs
  * (no binary table ships in /root/testdata).
  */
object Multimodal {

  case class MediaMeta(uri: String, codec: String, declared_len: Long)
  case class MediaRecord(id: Long, media: Array[Byte], meta: MediaMeta)

  /** Features of one decoded record — all integer-exact functions of the
    * payload: byte structure (length, 256-byte transport frames, a rolling
    * hash of the first frame) plus raster stats from the REAL PGM decode
    * (dimensions, pixel count incl. row padding, pixel sum, max sample). */
  case class MediaFeatures(
      id: Long, n_bytes: Int, n_frames: Int,
      width: Int, height: Int, n_pixels: Long,
      pixel_sum: Long, max_pixel: Int,
      first_frame_crc: Long)

  private val FRAME = 256 // bytes per transport frame

  /** Decode one record through the real codec. Exposed for MultimodalSpec
    * determinism checks; the distributed path is [[extractFeatures]]. */
  def decodeRecord(rec: MediaRecord): MediaFeatures = {
    val b = rec.media
    val img = PgmCodec.decode(PgmCodec.encode(b))
    var h = 0L
    b.take(FRAME).foreach(x => h = (h * 31 + (x & 0xff)) % 1000000007L)
    MediaFeatures(
      id = rec.id,
      n_bytes = b.length,
      n_frames = (b.length + FRAME - 1) / FRAME,
      width = img.width,
      height = img.height,
      n_pixels = img.width.toLong * img.height,
      pixel_sum = img.pixels.foldLeft(0L)(_ + _),
      max_pixel = if (img.pixels.isEmpty) 0 else img.pixels.max,
      first_frame_crc = h)
  }

  /** documents → binary media records (text bytes as the blob). */
  def mediaRecords(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    T.documents(s, d)
      .select(col("doc_id").as("id"), col("text").cast("binary").as("media"),
        struct(concat(lit("synthetic://"), col("source"), lit("/"), col("doc_id")).as("uri"),
          col("lang").as("codec"), col("n_chars").as("declared_len")).as("meta"))
      .as[MediaRecord]
  }

  /** Partition-wise batched decode: `mapPartitions` + `grouped(batch)` keeps
    * at most one batch of decoded features in memory per task — the same
    * contract as a vectorized Pandas-UDF decode, without collecting anything
    * to the driver. */
  def extractFeatures(records: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a heavier impl hands `batch` to the codec as one vectorized call
        batch.map(decodeRecord)
      }
    }
  }

  /** Untimed warmup hook (graft.Warmup): run the real decode stage over a
    * small slice so its first-use cost — the Dataset product-encoder
    * codegen and the interpreter→JIT ramp of the per-record decode loop
    * (~0.5 s measured, r5's unattributed mm_decode_integrity bench creep)
    * — is absorbed before the timed loop. 2048 records is enough per-row
    * iterations to JIT the hot loop at negligible cost. */
  def warmDecode(s: SparkSession, d: String): Unit =
    extractFeatures(mediaRecords(s, d).limit(2048)).count()

  /** Binary metadata features — no decode involved, so fully oracle-able:
    * byte length, 256-byte frame count, distinct byte values. */
  private def binaryStats(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(col("doc_id"),
        length(col("text").cast("binary")).as("n_bytes"),
        ceil(length(col("text").cast("binary")).cast("double") / 256).as("n_frames"),
        // native single pass (r16): split(text, '') allocated one 1-char
        // string per character per row before the distinct; the bitset/
        // HashSet walk allocates nothing on ASCII rows. Empty-string
        // parity pin: split('','') yields [""] → 1 (spec-pinned).
        graft.functions.VectorExprs.graft_distinct_cp_count(col("text"))
          .as("n_distinct_bytes"))
      .orderBy(col("doc_id"))

  private val binaryStatsSql =
    """SELECT doc_id, CAST(length(text) AS INT) AS n_bytes,
      |  CAST(ceil(length(text) / 256.0) AS BIGINT) AS n_frames,
      |  CAST(len(list_distinct(string_split(text, ''))) AS INT) AS n_distinct_bytes
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Real-codec decode pipeline, fully oracle-checkable: each record's
    * payload is deterministically wrapped as a binary PGM
    * ([[PgmCodec.encode]], the synthetic "camera") and ACTUALLY decoded by
    * the strict P5 parser inside the partition-wise batched loop. Every
    * emitted feature is integer arithmetic over the real decoded raster
    * (dimensions, pixel count incl. row padding, pixel sum, max sample),
    * so DuckDB re-derives the identical values from the payload bytes and
    * the driver hash-gates the whole encode→parse→raster→feature chain —
    * a decoder bug (off-by-one raster offset, header misparse, dropped
    * padding) breaks the hash. */
  private def decodeFeatures(s: SparkSession, d: String): DataFrame = {
    val feats = extractFeatures(mediaRecords(s, d)).toDF()
    feats
      .join(T.documents(s, d).select(col("doc_id").as("id"), col("source")), "id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_pixels")).as("total_pixels"),
        sum(col("pixel_sum")).as("total_pixel_sum"),
        max(col("max_pixel")).as("max_pixel"))
      .orderBy(col("source"))
  }

  /** DuckDB twin re-derives the decoded-pixel stats from the payload:
    * width is fixed at 16, height = ceil(len/16), padding bytes are zero
    * (add nothing to sum, never win max), pixel values are the payload
    * bytes (corpus is ASCII, so ascii(c) = the byte). */
  private val decodeFeaturesSql =
    """SELECT source, count(*) AS n_media,
      |  CAST(sum(16 * ((length(text) + 15) // 16)) AS BIGINT) AS total_pixels,
      |  CAST(sum(CASE WHEN length(text) = 0 THEN 0 ELSE
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
      |      (a, x) -> a + x) END) AS BIGINT) AS total_pixel_sum,
      |  CAST(max(CASE WHEN length(text) = 0 THEN 0 ELSE
      |    list_max(list_transform(string_split(text, ''), c -> ascii(c))) END) AS INT)
      |    AS max_pixel
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** Decode-integrity contract, oracle-checkable and now VALUE-exact on
    * every feature (r7 verdict #5 — no more range-only checks): byte
    * counts, transport-frame counts, and the per-record rolling-hash CRC
    * of the first frame are summed per source; DuckDB replays the exact
    * integer arithmetic (including the mod-1e9+7 rolling hash), so a
    * wrong byte anywhere in the first 256 of any record breaks the hash.
    * Two structural invariants from the REAL decode ride along: frame
    * arithmetic consistent with byte length, and raster padding within
    * one row (0 ≤ n_pixels − n_bytes < width). */
  private def decodeIntegrity(s: SparkSession, d: String): DataFrame = {
    val feats = extractFeatures(mediaRecords(s, d)).toDF()
    feats
      .join(T.documents(s, d).select(col("doc_id").as("id"), col("source")), "id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("n_frames")).as("total_frames"),
        sum(col("first_frame_crc")).as("crc_checksum"),
        expr("bool_and(n_frames = CAST(ceil(n_bytes / 256.0) AS INT))")
          .as("frames_consistent"),
        expr("bool_and(n_pixels - n_bytes BETWEEN 0 AND 15)").as("padding_ok"))
      .orderBy(col("source"))
  }

  private val decodeIntegritySql =
    """SELECT source, count(*) AS n_media,
      |  CAST(sum(length(text)) AS BIGINT) AS total_bytes,
      |  CAST(sum(CAST(ceil(length(text) / 256.0) AS BIGINT)) AS BIGINT)
      |    AS total_frames,
      |  CAST(sum(CASE WHEN length(text) = 0 THEN 0 ELSE
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(text, '')[1:256],
      |        c -> CAST(ascii(c) AS BIGINT))),
      |      (h, x) -> (h * 31 + x) % 1000000007) END) AS BIGINT)
      |    AS crc_checksum,
      |  TRUE AS frames_consistent, TRUE AS padding_ok
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** Frame sampling over the raw binary (no decode): the first 8 bytes of
    * each of the first 3 256-byte frames, hex-encoded — the bytes a real
    * keyframe sampler would hand to the decoder. Pure binary slicing, so
    * fully oracle-able. */
  private def frameSample(s: SparkSession, d: String): DataFrame = {
    val media = col("text").cast("binary")
    def frame(i: Int) =
      when(length(media) > i * 256,
        hex(substring(media, i * 256 + 1, 8))).otherwise(lit(null))
    T.documents(s, d)
      .select(col("doc_id"),
        ceil(length(media).cast("double") / 256).as("n_frames"),
        frame(0).as("frame0_hdr"), frame(1).as("frame1_hdr"), frame(2).as("frame2_hdr"))
      .orderBy(col("doc_id"))
  }

  private val frameSampleSql = {
    def f(i: Int) =
      s"CASE WHEN length(text) > ${i * 256} THEN hex(substring(text, ${i * 256 + 1}, 8)) END AS frame${i}_hdr"
    s"""SELECT doc_id, CAST(ceil(length(text) / 256.0) AS BIGINT) AS n_frames,
       |  ${f(0)}, ${f(1)}, ${f(2)}
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Waveform-style stats over raw bytes-as-samples (mean amplitude, RMS,
    * peak) — the shape of an audio feature pass, done portably on the
    * byte values so it oracles exactly (explicit left folds + round). */
  private def waveformStats(s: SparkSession, d: String): DataFrame = {
    // ONE native zero-allocation pass (r16, the GraftAvgHash lesson): the
    // r15 form still materialized the boxed code-point array per row plus
    // two array<double> cast copies. graft_cp_stats emits [n, Σcp, Σcp²,
    // max] as four longs; every partial sum is an exact integer < 2⁵³, so
    // dividing the long-sum cast to double equals the old double fold
    // bit-for-bit (MultimodalSpec pins it). Oracle twin unchanged.
    val st = graft.functions.VectorExprs.graft_cp_stats(col("text"))
    T.documents(s, d)
      .withColumn("st", st)
      .withColumn("n", element_at(col("st"), 1))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("n").cast("int").as("n_samples"),
        round(element_at(col("st"), 2).cast("double") / col("n"), 4).as("mean_amp"),
        round(sqrt(element_at(col("st"), 3).cast("double") / col("n")), 4).as("rms"),
        element_at(col("st"), 4).cast("int").as("peak"))
      .orderBy(col("doc_id"))
  }

  private val waveformStatsSql =
    """SELECT doc_id, CAST(len(string_split(text, '')) AS INT) AS n_samples,
      |  round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS DOUBLE))),
      |      (a, x) -> a + x) / len(string_split(text, '')), 4) AS mean_amp,
      |  round(sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS DOUBLE))),
      |      (a, x) -> a + x * x) / len(string_split(text, ''))), 4) AS rms,
      |  CAST(list_max(list_transform(string_split(text, ''), c -> ascii(c))) AS INT) AS peak
      |FROM documents WHERE length(text) > 0 ORDER BY doc_id""".stripMargin

  /** Perceptual average-hash over the raw bytes (the aHash scheme image
    * dedup uses, applied to byte blocks): 16 equal blocks, bit i set iff
    * block i's mean exceeds the overall mean. Means are compared through
    * cross-multiplied integer sums (16·blockSum > totalSum), so the whole
    * hash is exact integer arithmetic — bit-exact oracle. Equal hashes →
    * near-dup media candidates (bucket_size). */
  private def hashedFrame(s: SparkSession, d: String): DataFrame =
    // ONE native zero-allocation pass per row (r16): the previous
    // declarative chain (graft_codepoints → cast bigint → 16 ×
    // vsum(slice)) materialized a boxed per-CHAR array plus 16 slice
    // copies per row — that garbage, not any join or window, was the real
    // 1000×-sweep mm_dedup_cluster wall (303 s). GraftAvgHash computes the
    // bit-identical hash (MultimodalSpec pins native ≡ declarative);
    // the shared DuckDB CTE twin is unchanged.
    T.documents(s, d)
      .filter(length(col("text")) >= 16)
      .select(col("doc_id"),
        graft.functions.VectorExprs.graft_avg_hash(col("text")).as("avg_hash"))

  private def avgHash(s: SparkSession, d: String): DataFrame = {
    // bucket_size via per-hash agg + broadcast join, not a doc-level
    // window: Window.partitionBy(avg_hash) buffers every row of a bucket
    // in one task's sort, so a hot bucket (near-constant media) degrades
    // on a single core — same skew fix as [[dedupCluster]] (r16). The agg
    // side collapses map-side to ≤2¹⁶ rows regardless of occupancy.
    val hashed = hashedFrame(s, d).persist()
    val buckets = hashed.groupBy(col("avg_hash"))
      .agg(count(lit(1)).as("bucket_size"))
    hashed.join(broadcast(buckets), "avg_hash")
      .select(col("doc_id"), col("avg_hash"), col("bucket_size"))
      .orderBy(col("doc_id"))
  }

  /** Shared aHash CTE chain (base → sums → hashed) — the DuckDB twin of
    * [[hashedFrame]], hoisted so the three mm_* oracles can never drift
    * from each other (r10 review finding: three verbatim copies). Splice
    * after WITH / WITH RECURSIVE. */
  private lazy val hashedCteSql: String = {
    val sums = (0 until 16).map(i =>
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), codes[(blk*$i+1):(blk*$i+blk)]), (a,x) -> a+x) AS b$i")
      .mkString(",\n    ")
    val total = (0 until 16).map(i => s"b$i").mkString(" + ")
    val hash = (0 until 16).map(i =>
      s"CASE WHEN b$i * 16 > total THEN ${1L << i} ELSE 0 END").mkString(" + ")
    s"""base AS (
       |  SELECT doc_id,
       |    list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)) AS codes,
       |    CAST(length(text) // 16 AS INT) AS blk
       |  FROM documents WHERE length(text) >= 16),
       |sums AS (
       |  SELECT doc_id,
       |    $sums
       |  FROM base),
       |hashed AS (
       |  SELECT doc_id, CAST($hash AS BIGINT) AS avg_hash
       |  FROM (SELECT doc_id, ${(0 until 16).map(i => s"b$i").mkString(", ")},
       |          $total AS total FROM sums))""".stripMargin
  }

  private val avgHashSql =
    s"""WITH $hashedCteSql
       |SELECT doc_id, avg_hash,
       |  count(*) OVER (PARTITION BY avg_hash) AS bucket_size
       |FROM hashed ORDER BY doc_id""".stripMargin

  /** Near-dup media pairs by perceptual-hash Hamming distance 1..3, found
    * via LSH banding over DISTINCT hash values, never doc×doc: the 16-bit
    * aHash splits into four 4-bit bands; by pigeonhole any pair within
    * distance 3 agrees on at least one band, so a self-join of the ≤2¹⁶
    * distinct hash values bucketed on (band_id, band_value) finds every
    * such hash pair with corpus-size-INVARIANT cost (r9 verdict #2:
    * banding the doc rows directly made equal-hash cliques O(m²) before
    * the distance filter could drop them). Distance-0 pairs (equal
    * hashes) are mm_avg_hash's bucket view and are excluded here. */
  /** Banded candidate pairs over the DISTINCT 16-bit aHash values of a
    * (avg_hash)-column frame: four 4-bit bands; by pigeonhole every hash
    * pair within Hamming distance 3 shares at least one band. ≤65,536
    * nodes regardless of corpus size. Shared by [[hashHamming]] (the pair
    * view) and [[dedupCluster]] (the cluster view). */
  private def hashCandPairs(hashed: DataFrame): DataFrame = {
    val hashes = hashed.select(col("avg_hash")).distinct()
    val bands = hashes.select(col("avg_hash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band_id"),
          shiftright(col("avg_hash"), 4 * b).bitwiseAND(15).as("band_val"))): _*)).as("band"))
      .select(col("avg_hash"),
        col("band.band_id").as("band_id"), col("band.band_val").as("band_val"))
    bands.as("a").join(bands.as("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.avg_hash") < col("b.avg_hash"))
      .select(col("a.avg_hash").as("hash_a"), col("b.avg_hash").as("hash_b"))
      .distinct()
  }

  private def hashHamming(s: SparkSession, d: String): DataFrame = {
    val hashed = hashedFrame(s, d).persist()
    // hash-level pairs first (bounded by the 2¹⁶ hash space), THEN expand
    // to doc pairs by joining the corpus onto each side — the doc-pair
    // volume only materializes for hashes that actually are within
    // distance 1..3, which is the query's own output
    val hp = hashCandPairs(hashed)
      .withColumn("hamming",
        bit_count(col("hash_a").bitwiseXOR(col("hash_b"))).cast("int"))
      .filter(col("hamming").between(1, 3))
    val docs = hashed.select(col("doc_id"), col("avg_hash"))
    docs.as("x")
      .join(broadcast(hp), col("x.avg_hash") === col("hash_a"))
      .select(col("x.doc_id").as("ida"), col("hash_b"), col("hamming"))
      .join(docs.select(col("doc_id").as("idb"), col("avg_hash").as("hb")),
        col("hash_b") === col("hb"))
      // hash_a < hash_b strictly, so each unordered doc pair arises from
      // exactly one hash pair: least/greatest is dedup-free
      .select(least(col("ida"), col("idb")).as("doc_a"),
        greatest(col("ida"), col("idb")).as("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Oracle goes exact all-pairs (fine at sf0.01) — the banded Spark plan
    * must find the identical pair set. */
  private val hashHammingSql =
    s"""WITH $hashedCteSql
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.avg_hash, b.avg_hash)) AS INT) AS hamming
       |FROM hashed a JOIN hashed b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.avg_hash, b.avg_hash)) BETWEEN 1 AND 3
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Perceptual near-dup CLUSTERS: the multimodal family crossed with the
    * dedup family. Edges are aHash pairs within Hamming distance ≤ 3
    * (distance 0 — identical hashes — included: those are the exact dups),
    * found via the banded [[hashCandPairs]] builder, and the transitive
    * closure is the same fixpoint [[graft.ops.Dedup.components]] kernel
    * the text dedup family runs — one CC implementation for every
    * modality. Output is the per-media cluster assignment with cluster
    * size and the min-id survivor flag, i.e. the keep/drop decision a
    * media dedup stage ships.
    *
    * Scale shape (r9 verdict #2 rewrite): clustering runs over DISTINCT
    * hash values, never over doc-level pairs, whose equal-hash cliques
    * blow up O(m²) (101.8 s at sf0.1 in round 9). Every distinct hash
    * present has ≥1 doc and docs sharing a hash are distance-0 neighbors,
    * so hash-level transitive closure equals doc-level closure (docs on
    * an intermediate hash are the bridge). Because the aHash space is
    * 16-bit, the distinct-hash set is a CONSTANT-BOUNDED model
    * (≤65,536 longs — a model fit, like an IVF codebook, not a
    * corpus-scale collect; the distinct's partial agg collapses each scan
    * partition to ≤2¹⁶ rows before one tiny shuffle), so the closure is a
    * driver-side union-find with neighbor ENUMERATION: the ≤3-bit-flip
    * neighborhood is the fixed 696-mask set, so hash edges never
    * materialize at all — no banded self-join and no distributed fixpoint
    * rounds (the round-dominated [[graft.ops.Dedup.components]] run took
    * 37 s on this graph purely in per-round job overhead; a 64-bit pHash
    * variant, whose hash space is NOT enumerable, is what that fixpoint
    * is for). Worst case 65,536 × 696 hash-set probes is sub-second and
    * corpus-size-invariant. The tiny hash→cluster map then
    * broadcast-joins back to the corpus; singleton docs (cluster_size 1 =
    * no neighbor anywhere) drop out exactly as the doc-level node set did.
    *
    * Skew shape (r16, r15 verdict #2): cluster stats are aggregated at the
    * HASH level (`groupBy(avg_hash)` — map-side partial agg over ≤2¹⁶
    * groups, then a driver fold over the tiny per-hash table), never via a
    * doc-level window per cluster. The previous `Window.partitionBy(hc)`
    * buffered every doc row of a cluster in ONE task's sort, so an
    * adversarial corpus (near-constant images → one hot cluster) degraded
    * quadratically-in-occupancy on a single core — the 1000× sweep's 307 s
    * tail. Per-hash aggregation collapses each scan partition to ≤2¹⁶ rows
    * before any shuffle regardless of how hot a bucket is; the doc-level
    * pass is then scan → broadcast-join → filter, all linear and
    * skew-free. */
  private def dedupCluster(s: SparkSession, d: String): DataFrame = {
    // persisted: consumed by the per-hash agg AND the doc-level join; the
    // cached frame is two longs per doc, the aHash scan it avoids repeating
    // is the query's dominant linear cost (Bench clears cache per query)
    val hashed = hashedFrame(s, d).persist()
    // one pass: per-hash doc count + min doc id (the cluster-stat inputs);
    // ≤65,536 rows by construction, so the collect is a model fit, not a
    // corpus-scale pull — same contract as the distinct() it replaces
    val perHash: Array[(Long, Long, Long)] = hashed
      .groupBy(col("avg_hash"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("min_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val present = perHash.map(_._1)
    val idx: Map[Long, Int] = present.zipWithIndex.toMap
    val parent = Array.tabulate(present.length)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    val masks = (1 until (1 << 16)).filter(m => Integer.bitCount(m) <= 3)
    var i = 0
    while (i < present.length) {
      for (m <- masks) idx.get(present(i) ^ m).foreach { j =>
        val ri = find(i); val rj = find(j)
        if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
      }
      i += 1
    }
    // fold the per-hash stats up to cluster level on the driver (≤2¹⁶
    // entries): cluster_id = min doc id across member hashes, cluster_size
    // = sum of member-hash doc counts
    val clusterMin = new scala.collection.mutable.HashMap[Int, Long]
    val clusterCnt = new scala.collection.mutable.HashMap[Int, Long]
    perHash.indices.foreach { k =>
      val r = find(k)
      val (_, cnt, minId) = perHash(k)
      clusterMin.updateWith(r)(v => Some(v.fold(minId)(math.min(_, minId))))
      clusterCnt.updateWith(r)(v => Some(v.fold(cnt)(_ + cnt)))
    }
    val hashCluster = s.createDataFrame(
      present.indices.map { k =>
        val r = find(k)
        (present(k), clusterMin(r), clusterCnt(r))
      }
    ).toDF("avg_hash", "cluster_id", "cluster_size")
      .filter(col("cluster_size") >= 2)
    hashed.join(broadcast(hashCluster), "avg_hash")
      .withColumn("is_survivor", col("doc_id") === col("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        col("is_survivor"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: exact all-pairs edges + WITH RECURSIVE transitive closure
    * (the dedup_clusters oracle pattern over the aHash edge set). */
  private val dedupClusterSql =
    s"""WITH RECURSIVE $hashedCteSql,
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM hashed a JOIN hashed b ON a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.avg_hash, b.avg_hash)) <= 3),
       |edges AS (
       |  SELECT id_a, id_b FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs
       |  UNION SELECT id_a, id_a FROM pairs
       |  UNION SELECT id_b, id_b FROM pairs),
       |reach(node, r) AS (
       |  SELECT id_a, id_b FROM edges
       |  UNION
       |  SELECT e.id_a, w.r FROM edges e JOIN reach w ON w.node = e.id_b),
       |labels AS (
       |  SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node)
       |SELECT doc_id, cluster_id,
       |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       |  doc_id = cluster_id AS is_survivor
       |FROM labels ORDER BY doc_id""".stripMargin

  /** 64-bit pHash frame: the [[hashedFrame]] scheme at 64 blocks (docs
    * shorter than 64 chars carry no full block per bit and are excluded,
    * mirroring the ≥16 gate of the 16-bit family). One native
    * zero-allocation pass per row ([[graft.functions.GraftVec.avgHash64]],
    * bit-parity-pinned in MultimodalSpec). */
  private def phashedFrame(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .filter(length(col("text")) >= 64)
      .select(col("doc_id"),
        graft.functions.VectorExprs.graft_avg_hash64(col("text")).as("phash"))

  /** Perceptual near-dup clusters over the 64-BIT pHash — the
    * [[dedupCluster]] semantics on a hash space that is NOT enumerable
    * (r16 verdict #2: the general path the 16-bit query's driver
    * union-find cannot cover). No 696-mask neighborhood walk and no
    * driver fold are possible over 2⁶⁴ values, so everything stays
    * distributed:
    *
    *  - candidate edges via banded LSH over the DISTINCT hash values
    *    (four 16-bit bands; pigeonhole: any pair within Hamming distance
    *    3 agrees on ≥1 full band), filtered to true distance ≤ 3 —
    *    corpus-cardinality nodes, never doc×doc;
    *  - transitive closure via the distributed
    *    [[graft.ops.Dedup.components]] frontier fixpoint (pointer
    *    jumping past round 8, checkpoint-bounded lineage) — the same CC
    *    kernel the text dedup family runs, now exercised on image-like
    *    hashes;
    *  - per-hash stats as a partial-agg groupBy (hash cardinality ~
    *    corpus cardinality here, exactly why the 16-bit ≤2¹⁶ collect
    *    cannot apply), cluster stats a second groupBy over the labeled
    *    hash table, and the doc join-back planned from true cached sizes
    *    (FrameCache.eager).
    *
    * Docs sharing a hash are distance-0 neighbors, so hash-level closure
    * equals doc-level closure; singleton docs (cluster_size 1) drop out,
    * matching [[dedupCluster]]'s contract. */
  /** Edge cap for [[phash64Cluster]]'s driver union-find tier — the
    * mm_dedup_cluster 2¹⁶ bound, here on MEASURED candidate edges (two
    * longs each, ≤ ~1 MB collected). Overridable via the
    * `graft.phash64.uf.cap` system property so specs can force the
    * distributed fixpoint tier on small fixtures. */
  private def driverEdgeCap: Long =
    sys.props.get("graft.phash64.uf.cap").map(_.toLong).getOrElse(1L << 16)

  /** Min-root union-find over an edge list: returns node → component
    * label where the label is the component's smallest member (merging
    * always parents the larger root under the smaller, so every root is
    * its component's min — the same label [[graft.ops.Dedup.components]]
    * converges to). Iterative find + path compression: no stack risk at
    * the 2¹⁶-edge cap. */
  private[graft] def unionFindLabels(edges: Array[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElse(x, x) != x) x = parent(x)
      var y = x0 // compress the walked path onto the root
      while (parent.getOrElse(y, y) != y) { val n = parent(y); parent(y) = x; y = n }
      x
    }
    edges.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    edges.iterator.flatMap(e => Iterator(e._1, e._2)).toSet[Long]
      .iterator.map(x => x -> find(x)).toMap
  }

  private def phash64Cluster(s: SparkSession, d: String): DataFrame = {
    // NO persist on the hashed frame: graft_avg_hash64 makes it a cheap
    // map-only native scan, and its two consumers (the per-hash agg and
    // the final doc join) each pay a rescan instead of a corpus-sized
    // cache write + read (the ta_winnowing recompute-over-materialize
    // lesson).
    val hashed = phashedFrame(s, d)
    val perHash = graft.ops.FrameCache.eager(
      hashed.groupBy(col("phash"))
        .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("min_id")))
    val bands = perHash.select(col("phash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band_id"),
          shiftrightunsigned(col("phash"), 16 * b)
            .bitwiseAND(0xFFFFL).as("band_val"))): _*)).as("band"))
      .select(col("phash"), col("band.band_id").as("band_id"),
        col("band.band_val").as("band_val"))
    val pairs = graft.ops.FrameCache.eager(
      bands.as("a").join(bands.as("b"),
          col("a.band_id") === col("b.band_id") &&
            col("a.band_val") === col("b.band_val") &&
            col("a.phash") < col("b.phash"))
        .select(col("a.phash").as("id_a"), col("b.phash").as("id_b"))
        .distinct()
        .filter(bit_count(col("id_a").bitwiseXOR(col("id_b"))) <= 3))
    // Label assignment is tiered on the MEASURED candidate-edge count —
    // never the 2⁶⁴ hash space, which stays non-enumerable (the r16
    // generality constraint this query exists for). r17 verdict #5: the
    // 2.9 s sf0.1 receipt was almost entirely fixpoint job-round plus
    // label-join/stats overhead spent on THREE edges.
    //  - 0 edges: every hash is its own component, so a cluster is
    //    exactly one hash — cluster_id = its min doc, size = its doc
    //    count; the closure, the label join and the stats groupBy all
    //    collapse away (multi-doc SAME-hash clusters survive via
    //    cnt ≥ 2 either way; a cross-hash cluster needs an edge).
    //  - ≤ 2¹⁶ edges: collect the EDGE LIST (≤ cap rows of two longs,
    //    ~1 MB) and label via a driver min-root union-find — the
    //    mm_dedup_cluster bounded-driver precedent, gated on measured
    //    edge volume; labels broadcast-join back, hashes in no edge
    //    keep label = phash.
    //  - past the cap: the distributed [[graft.ops.Dedup.components]]
    //    frontier fixpoint, unchanged — the 100 TB path.
    // The count is one cheap job over the already-cached pairs frame.
    val nPairs = pairs.count()
    val hashCluster = graft.ops.FrameCache.eager(
      if (nPairs == 0)
        perHash.filter(col("cnt") >= 2)
          .select(col("phash"), col("min_id").as("cluster_id"),
            col("cnt").as("cluster_size"))
      else {
        val labeled =
          if (nPairs <= driverEdgeCap) {
            import s.implicits._
            val lm = unionFindLabels(
              pairs.collect().map(r => (r.getLong(0), r.getLong(1))))
            val labelsDf = lm.toSeq.toDF("phash", "label")
            perHash.join(broadcast(labelsDf), Seq("phash"), "left")
              .select(col("phash"), col("cnt"), col("min_id"),
                coalesce(col("label"), col("phash")).as("label"))
          } else {
            val labels = graft.ops.Dedup.components(
              pairs, perHash.select(col("phash").as("id")))
            perHash.join(labels, col("phash") === col("node"))
              .select(col("phash"), col("cnt"), col("min_id"), col("label"))
          }
        val clusterStats = labeled.groupBy(col("label"))
          .agg(sum(col("cnt")).as("cluster_size"), min(col("min_id")).as("cluster_id"))
          .filter(col("cluster_size") >= 2)
        labeled.join(clusterStats, "label")
          .select(col("phash"), col("cluster_id"), col("cluster_size"))
      })
    hashed.join(hashCluster, "phash")
      .withColumn("is_survivor", col("doc_id") === col("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        col("is_survivor"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin of [[phashedFrame]] — the [[hashedCteSql]] chain at 64
    * blocks. Bit 63 is the sign bit: the CASE emits BIGINT's minimum
    * value (as `-9223372036854775807 - 1`, parseable without HUGEINT
    * promotion games) so the arithmetic sum of distinct powers of two
    * reconstructs the native hash's two's-complement value exactly. */
  private lazy val phashedCteSql: String = {
    val sums = (0 until 64).map(i =>
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), codes[(blk*$i+1):(blk*$i+blk)]), (a,x) -> a+x) AS b$i")
      .mkString(",\n    ")
    val total = (0 until 64).map(i => s"b$i").mkString(" + ")
    val hash = (0 until 64).map { i =>
      val bit = if (i == 63) "(-9223372036854775807 - 1)" else s"${1L << i}"
      s"CASE WHEN b$i * 64 > total THEN CAST($bit AS BIGINT) ELSE 0 END"
    }.mkString(" + ")
    s"""pbase AS (
       |  SELECT doc_id,
       |    list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)) AS codes,
       |    CAST(length(text) // 64 AS INT) AS blk
       |  FROM documents WHERE length(text) >= 64),
       |psums AS (
       |  SELECT doc_id,
       |    $sums
       |  FROM pbase),
       |phashed AS (
       |  SELECT doc_id, CAST($hash AS BIGINT) AS phash
       |  FROM (SELECT doc_id, ${(0 until 64).map(i => s"b$i").mkString(", ")},
       |          $total AS total FROM psums))""".stripMargin
  }

  /** Oracle: exact all-pairs distance-≤3 edges + WITH RECURSIVE closure —
    * the [[dedupClusterSql]] pattern over the 64-bit hash. */
  private val phash64ClusterSql =
    s"""WITH RECURSIVE $phashedCteSql,
       |ppairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM phashed a JOIN phashed b ON a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.phash, b.phash)) <= 3),
       |pedges AS (
       |  SELECT id_a, id_b FROM ppairs
       |  UNION SELECT id_b, id_a FROM ppairs
       |  UNION SELECT id_a, id_a FROM ppairs
       |  UNION SELECT id_b, id_b FROM ppairs),
       |preach(node, r) AS (
       |  SELECT id_a, id_b FROM pedges
       |  UNION
       |  SELECT e.id_a, w.r FROM pedges e JOIN preach w ON w.node = e.id_b),
       |plabels AS (
       |  SELECT node AS doc_id, min(r) AS cluster_id FROM preach GROUP BY node)
       |SELECT doc_id, cluster_id,
       |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       |  doc_id = cluster_id AS is_survivor
       |FROM plabels ORDER BY doc_id""".stripMargin

  /** Metadata-vs-payload integrity: declared size (n_chars) against actual
    * byte length — the validation pass a media pipeline runs before
    * spending decode cycles. `ascii_only` is the corpus guard behind every
    * byte-level oracle in this file (and binaryStats/waveformStats/
    * avgHash): the DuckDB twins re-derive pixel/sample values via
    * `ascii(c)` over character splits, which equals the UTF-8 byte only
    * while the corpus is pure ASCII. Spark COMPUTES the predicate
    * (char length = byte length for every doc) while the oracle pins TRUE,
    * so a non-ASCII fixture entering the corpus fails HERE by name
    * instead of as an opaque hash mismatch downstream. */
  private def metaIntegrity(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .withColumn("actual", length(col("text")))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("n_chars") =!= col("actual"), 1L).otherwise(0L)).as("n_mismatched"),
        max(abs(col("n_chars") - col("actual"))).as("max_abs_diff"),
        sum(when(col("actual") === 0, 1L).otherwise(0L)).as("n_empty"),
        expr("bool_and(length(text) = octet_length(text))").as("ascii_only"))

  private val metaIntegritySql =
    """SELECT count(*) AS n_total,
      |  CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_mismatched,
      |  CAST(max(abs(n_chars - length(text))) AS BIGINT) AS max_abs_diff,
      |  CAST(sum(CASE WHEN length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
      |  TRUE AS ascii_only
      |FROM documents""".stripMargin

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("mm_meta_integrity", metaIntegrity, Some(metaIntegritySql)),
    QuerySpec("mm_binary_stats", binaryStats, Some(binaryStatsSql)),
    QuerySpec("mm_frame_sample", frameSample, Some(frameSampleSql)),
    QuerySpec("mm_waveform_stats", waveformStats, Some(waveformStatsSql)),
    QuerySpec("mm_avg_hash", avgHash, Some(avgHashSql)),
    QuerySpec("mm_decode_features", decodeFeatures, Some(decodeFeaturesSql)),
    QuerySpec("mm_decode_integrity", decodeIntegrity, Some(decodeIntegritySql)),
    QuerySpec("mm_hash_hamming", hashHamming, Some(hashHammingSql)),
    QuerySpec("mm_dedup_cluster", dedupCluster, Some(dedupClusterSql)),
    QuerySpec("mm_phash64_cluster", phash64Cluster, Some(phash64ClusterSql)))
}
