package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.{Lemmatizer, Text}

/** SCC conversation-JSON ingest (SURVEY.md §2.1 S1–S4, §2.2 F1–F7, §2.3
  * T1–T5) — the reference's data_loader/ re-expressed as one declarative
  * read + transform chain:
  *
  *  - S1 scan: fixed schema (never inferred — §1.3), `multiLine` (one
  *    conversation per file), `recursiveFileLookup` (nested split dirs),
  *    provenance via `input_file_name` (scc_dataset_loader.py:20-56);
  *  - F1 conversation-level medium filter: the WHOLE conversation drops if
  *    ANY message is Instagram/Telegram (scc_dataset_loader.py:40-41 —
  *    an array-exists predicate, not a message filter);
  *  - F2 inbound-only, F3 empty-body (scc_dataset_loader.py:43,
  *    base_dataset_loader.py:69);
  *  - F4 boilerplate scrub: literal chunk then `Description for file \d+:`
  *    regex (scc_dataset_loader.py:58-75 — the literal contains regex
  *    metachars, so pass 1 must be non-regex);
  *  - F5 raw_body/body projection (base_dataset_loader.py:70-76);
  *  - T1–T5 lowercase → tokenize → alpha filter → lemma dictionary →
  *    stopwords → re-join (base_dataset_loader.py:80-91);
  *  - O1/O2 stream construction: global sort by time (missing → last, the
  *    reference's float("inf") sentinel, run_detectors.py:29) + limit.
  *
  * At scale: the JSON scan parallelizes per file; everything after it is
  * map-only until the final sort, which TakeOrderedAndProject bounds when a
  * limit is present.
  */
object SccJsonSource {

  val messageSchema: StructType = StructType(Seq(
    StructField("body", StringType),
    StructField("time", LongType),
    StructField("medium", StringType),
    StructField("is_inbound", BooleanType)))

  val convSchema: StructType = StructType(Seq(
    StructField("messages", ArrayType(messageSchema)),
    StructField("label", StringType),
    StructField("dataset", StringType)))

  private val boilerplate =
    "This message contains files. If the description for a file does not " +
      "make sense, ignore it.Here are descriptions of those files:"

  /** S1 + F1: conversations with label/dataset defaults. The F1 medium
    * filter (drop the WHOLE conversation if ANY message is Instagram/
    * Telegram) applies only in the default mode — the reference skips it
    * under `all_messages` (scc_dataset_loader.py:38-43). */
  def readConversations(s: SparkSession, dir: String,
      allMessages: Boolean = false): DataFrame = {
    val raw = s.read.schema(convSchema)
      .option("multiLine", "true")
      .option("recursiveFileLookup", "true")
      .json(dir)
      .withColumn("src_file", input_file_name())
      .withColumn("label", coalesce(col("label"), lit("scam")))
      .withColumn("dataset", coalesce(col("dataset"), lit("scc")))
    if (allMessages) raw
    else raw.filter(!exists(col("messages"),
      m => m.getField("medium").isin("Instagram", "Telegram")))
  }

  /** F2–F5 + T1–T5: the preprocessed message frame. In the default mode
    * only inbound (scammer) messages survive (F2); with `allMessages` the
    * F1/F2 filters are bypassed but the F4 scrub and full preprocessing
    * chain (incl. lemmatization) still apply, exactly like the reference
    * (scc_dataset_loader.py:38-45 — `remove_file_description` and
    * `preprocess_messages` sit outside the `if not all_messages` branch). */
  def preprocessedMessages(s: SparkSession, dir: String,
      allMessages: Boolean = false): DataFrame = {
    val exploded = readConversations(s, dir, allMessages)
      .select(col("src_file"), col("label"), col("dataset"),
        explode(col("messages")).as("m"))
      .select(col("src_file"), col("label"), col("dataset"),
        col("m.body").as("body"), col("m.time").as("time"),
        col("m.medium").as("medium"), col("m.is_inbound").as("is_inbound"))
      .filter(if (allMessages) lit(true) else col("is_inbound"))      // F2
      .filter(col("body").isNotNull && col("body") =!= "")            // F3
    val scrubbed = exploded
      .withColumn("raw_body", col("body"))                            // F5
      .withColumn("body",                                             // F4
        regexp_replace(
          replace(col("body"), lit(boilerplate), lit("")),
          "Description for file \\d+:", ""))
    scrubbed.withColumn("body",                                       // T1–T5
      array_join(
        Lemmatizer.lemmatizeArray(Text.tokens(col("body"))), " "))
      .filter(col("body") =!= "")
  }

  /** O1 + O2: the reference's message stream — global time order, missing
    * time last, bounded at maxMessages (run_detectors.py:14-34). */
  def messageStream(s: SparkSession, dir: String, maxMessages: Int = 200): DataFrame =
    preprocessedMessages(s, dir)
      .orderBy(col("time").asc_nulls_last, col("body"))
      .limit(maxMessages)

  /** S2: parquet cache-or-compute keyed by md5 of the config string (the
    * reference's pickle memoization, base_dataset_loader.py:36-54). */
  def cacheOrCompute(s: SparkSession, cacheDir: String, configKey: String)(
      compute: => DataFrame): DataFrame = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(configKey.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val path = s"$cacheDir/data_$key.parquet"
    if (new java.io.File(path).exists()) s.read.parquet(path)
    else {
      val df = compute
      df.write.mode("overwrite").parquet(path)
      s.read.parquet(path)
    }
  }

  /** S4: the 70/30 seeded split (utils/split_into_directories.py:6-30) as a
    * row-level randomSplit — split rows, not files. */
  def trainTestSplit(df: DataFrame, trainRatio: Double = 0.7, seed: Long = 42L)
      : (DataFrame, DataFrame) = {
    val Array(train, test) = df.randomSplit(Array(trainRatio, 1 - trainRatio), seed)
    (train, test)
  }

  /** F6: seeded exact-n conversation sampling (scc_dataset_loader.py:53-54's
    * random.sample). `orderBy(rand(seed)).limit(n)` gives exactly n rows
    * like the reference; `df.sample(frac)` is approximate and wrong here
    * (SURVEY.md F6). */
  def sampleConversations(df: DataFrame, n: Int, seed: Long = 42L): DataFrame =
    df.orderBy(rand(seed), col("src_file")).limit(n)

  /** S3: the reference's stdout JSON report sink (run_detectors.py:245) —
    * the result frame rendered as JSON lines. `.toJSON` streams through the
    * executors; only the final strings are collected, and callers at scale
    * use `df.write.json(path)` with the same row shape instead. */
  def jsonReport(df: DataFrame): Seq[String] =
    df.toJSON.collect().toSeq
}
