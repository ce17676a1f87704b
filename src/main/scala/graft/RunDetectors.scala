package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Text
import graft.sources.SccJsonSource

/** Drop-in twin of the reference's CLI entry point (run_detectors.py:38-252):
  * same flags, same summary JSON shape, same stdout/stderr contract — so a
  * user of the reference can switch binaries and keep their invocation.
  *
  *   runMain graft.RunDetectors --data-dir DIR [--split test]
  *     [--train-subdir train_convs] [--test-subdir test_convs]
  *     [--max-messages 200] [--update-interval 100] [--top-frequency 10]
  *     [--freq-query term]... [--exclude-duplicates] [--all-messages]
  *     [--show-text]
  *
  * Differences, documented (SURVEY.md §7.3): token counts and probe
  * estimates are exact (the reference reports CMS estimates — same
  * quantities, error removed); burst ratios use exact half-window counts
  * (the reference reads DGIM estimates). Everything else — filters, scrub,
  * preprocessing, check-then-insert dedup scoring, exclusion-after-scoring
  * (trap #2: excluded messages still feed detectors; snapshot cadence
  * counts kept messages only), snapshot shape — follows the reference.
  */
object RunDetectors {

  case class Config(
      dataDir: String = "data",
      trainSubdir: String = "train_convs",
      testSubdir: String = "test_convs",
      split: String = "test",
      allMessages: Boolean = false,
      maxMessages: Int = 200,
      freqQueries: Seq[String] = Nil,
      showText: Boolean = false,
      excludeDuplicates: Boolean = false,
      updateInterval: Int = 100,
      topFrequency: Int = 10)

  def parseArgs(args: Array[String]): Config = {
    @annotation.tailrec
    def go(rest: List[String], c: Config): Config = rest match {
      case "--data-dir" :: v :: t         => go(t, c.copy(dataDir = v))
      case "--train-subdir" :: v :: t     => go(t, c.copy(trainSubdir = v))
      case "--test-subdir" :: v :: t      => go(t, c.copy(testSubdir = v))
      case "--split" :: v :: t            => go(t, c.copy(split = v))
      case "--all-messages" :: t          => go(t, c.copy(allMessages = true))
      case "--scammer-only" :: t          => go(t, c.copy(allMessages = false))
      case "--max-messages" :: v :: t     => go(t, c.copy(maxMessages = v.toInt))
      case "--freq-query" :: v :: t       => go(t, c.copy(freqQueries = c.freqQueries :+ v))
      case "--show-text" :: t             => go(t, c.copy(showText = true))
      case "--hide-text" :: t             => go(t, c.copy(showText = false))
      case "--exclude-duplicates" :: t    => go(t, c.copy(excludeDuplicates = true))
      case "--include-duplicates" :: t    => go(t, c.copy(excludeDuplicates = false))
      case "--update-interval" :: v :: t  => go(t, c.copy(updateInterval = v.toInt))
      case "--top-frequency" :: v :: t    => go(t, c.copy(topFrequency = v.toInt))
      case Nil                            => c
      case x :: _ => throw new IllegalArgumentException(s"unknown argument: $x")
    }
    go(args.toList, Config())
  }

  /** The whole run as one Spark program; returns the summary as a JSON
    * string (the reference's stdout payload). */
  def run(spark: SparkSession, c: Config): String = {
    val splitDir =
      s"${c.dataDir}/${if (c.split == "train") c.trainSubdir else c.testSubdir}"

    // ingest + preprocess + stream order (S1, F1–F5, T1–T5, O1/O2)
    val msgs = (if (c.allMessages)
        SccJsonSource.readConversations(spark, splitDir)
          .select(explode(col("messages")).as("m"))
          .select(col("m.body").as("body"), col("m.time").as("time"))
          .filter(col("body").isNotNull && col("body") =!= "")
          .withColumn("raw_body", col("body"))
          .withColumn("body", array_join(Text.tokens(col("body")), " "))
          .filter(col("body") =!= "")
      else
        SccJsonSource.preprocessedMessages(spark, splitDir))
      .orderBy(col("time").asc_nulls_last, col("body"))
      .limit(c.maxMessages)
      .withColumn("msg_idx",
        row_number().over(Window.orderBy(col("time").asc_nulls_last, col("body"))) - 1)
      .select(col("msg_idx"), col("body"))
      .persist()

    // check-then-insert dedup scoring by arrival index (ST5, trap #1)
    val pairs = msgs
      .select(col("msg_idx"), explode(array_distinct(
        Text.shingles3(split(col("body"), " ")))).as("sh"))
    val firstSeen = pairs.groupBy(col("sh")).agg(min(col("msg_idx")).as("first_idx"))
    val scores = pairs.join(firstSeen, "sh")
      .groupBy(col("msg_idx"))
      .agg(avg(when(col("first_idx") < col("msg_idx"), 1.0).otherwise(0.0)).as("dup_score"))
    val scored = msgs.join(scores, Seq("msg_idx"), "left")
      .withColumn("dup_score", coalesce(col("dup_score"), lit(0.0)))
      .withColumn("is_duplicate", col("dup_score") >= 0.7)
      .persist()

    // exclusion happens AFTER detectors saw the message (trap #2): kept
    // messages drive `processed` and the snapshot cadence
    val kept = (if (c.excludeDuplicates) scored.filter(!col("is_duplicate")) else scored)
      .withColumn("kept_idx",
        row_number().over(Window.orderBy(col("msg_idx"))) - 1)
      .persist()

    val processed = kept.count()
    val excluded = if (c.excludeDuplicates) scored.count() - processed else 0L
    val dupRow = kept.agg(
      sum(when(col("is_duplicate"), 1L).otherwise(0L)).as("total"),
      avg(when(col("is_duplicate"), 1.0).otherwise(0.0)).as("rate"),
      avg(col("dup_score")).as("avg_score")).collect()(0)

    val tokens = kept.select(col("kept_idx"), explode(split(col("body"), " ")).as("token"))
      .filter(col("token") =!= "").persist()

    // per-snapshot top tokens + duplicates-so-far (ST4/O6)
    val snapshotOf = (expr(s"kept_idx div ${c.updateInterval}"))
    val snapCounts = tokens.withColumn("snapshot", snapshotOf)
      .groupBy(col("snapshot"), col("token")).agg(count(lit(1)).as("cnt"))
    val wSnap = Window.partitionBy(col("snapshot")).orderBy(col("cnt").desc, col("token"))
    val snapTop = snapCounts.withColumn("rank", row_number().over(wSnap))
      .filter(col("rank") <= c.topFrequency)
      .orderBy(col("snapshot"), col("rank")).collect()
      .groupBy(_.getAs[Long]("snapshot"))
    val dupsSoFar = kept.withColumn("snapshot", snapshotOf)
      .groupBy(col("snapshot"))
      .agg(sum(when(col("is_duplicate"), 1L).otherwise(0L)).as("d"))
      .collect().map(r => r.getAs[Long]("snapshot") -> r.getAs[Long]("d"))
      .sortBy(_._1)

    // burst (W2): recent vs previous half-interval counts at stream end
    val half = math.max(1, 25)
    val maxIdx = processed - 1
    val burstRows = tokens
      .filter(col("kept_idx") > maxIdx - 2L * half)
      .withColumn("recent", col("kept_idx") > maxIdx - half)
      .groupBy(col("token"))
      .agg(sum(when(col("recent"), 1L).otherwise(0L)).as("recent_cnt"),
        sum(when(!col("recent"), 1L).otherwise(0L)).as("prev_cnt"))
      .withColumn("ratio", (col("recent_cnt") + lit(1e-6)) / (col("prev_cnt") + lit(1e-6)))
      .filter(col("recent_cnt") >= 1 && col("ratio") >= 2.0)
      .orderBy(col("ratio").desc, col("recent_cnt").desc, col("token"))
      .collect()

    // probe estimates (A12; exact, probe lowercased — T8)
    val probes =
      if (c.freqQueries.isEmpty) Map.empty[String, Long]
      else {
        val counts = tokens.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        c.freqQueries.map(q => q -> counts.getOrElse(q.toLowerCase, 0L)).toMap
      }

    // final top tokens (O3)
    val finalTop = tokens.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(c.topFrequency).collect()

    val messagesOut =
      if (c.showText)
        kept.orderBy(col("kept_idx"))
          .select(col("body"), col("dup_score"), col("is_duplicate")).collect()
      else Array.empty[org.apache.spark.sql.Row]

    // ---- render the reference's summary JSON (run_detectors.py:227-243)
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods._
    // a snapshot exists only when its full interval completed
    // (run_detectors.py:193: `if processed % update_interval == 0`);
    // the trailing partial period feeds the final analysis instead
    val snapshotsJson = dupsSoFar
      .filter { case (snap, _) => (snap + 1) * c.updateInterval <= processed }
      .map { case (snap, _) =>
      val cumDups = dupsSoFar.takeWhile(_._1 <= snap).map(_._2).sum
      ("message_count" -> ((snap + 1) * c.updateInterval)) ~
        ("top_10_tokens" -> snapTop.getOrElse(snap, Array.empty).toList.map(r =>
          (r.getAs[String]("token"), r.getAs[Long]("cnt")))) ~
        ("burst" -> List.empty[String]) ~
        ("duplicates_so_far" -> cumDups)
    }.toList
    val json =
      ("split" -> c.split) ~
        ("processed" -> processed) ~
        ("excluded_duplicates" -> excluded) ~
        ("update_interval" -> c.updateInterval) ~
        ("frequency_estimates" -> probes) ~
        ("duplicates" ->
          ("total" -> dupRow.getAs[Long]("total")) ~
            ("rate" -> (if (processed > 0) dupRow.getAs[Double]("rate") else 0.0)) ~
            ("avg_score" -> (if (processed > 0) dupRow.getAs[Double]("avg_score") else 0.0))) ~
        ("periodic_snapshots" -> snapshotsJson) ~
        ("final_burst" -> burstRows.toList.map(r =>
          ("token" -> r.getAs[String]("token")) ~
            ("recent_count" -> r.getAs[Long]("recent_cnt")) ~
            ("previous_count" -> r.getAs[Long]("prev_cnt")) ~
            ("ratio" -> BigDecimal(r.getAs[Double]("ratio"))
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))) ~
        ("final_top_tokens" -> finalTop.toList.map(r =>
          (r.getAs[String]("token"), r.getAs[Long]("cnt")))) ~
        ("messages" -> (if (c.showText) Some(messagesOut.toList.map(r =>
          ("text" -> r.getAs[String]("body")) ~
            ("duplicate_score" -> r.getAs[Double]("dup_score")) ~
            ("is_duplicate" -> r.getAs[Boolean]("is_duplicate")))) else None))
    pretty(render(json))
  }

  def main(args: Array[String]): Unit = {
    val c = parseArgs(args)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = run(spark, c)
    println(out)                                         // S3: stdout JSON
    System.err.println(s"Processed messages from split '${c.split}'.")
    spark.stop()
  }
}
