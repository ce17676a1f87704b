package graft

import org.json4s._
import org.json4s.jackson.JsonMethods._

/** End-to-end CLI twin on the FIXTURES.md fixture: summary numbers computed
  * by hand from the fixture contents (SURVEY.md §5.4). */
class RunDetectorsSpec extends SparkSpec {
  implicit val fmts: Formats = DefaultFormats

  private val fixture = new java.io.File("src/test/resources/scc_fixture").getAbsolutePath

  test("train split: 3 messages, no duplicates") {
    val json = parse(RunDetectors.run(spark,
      RunDetectors.Config(dataDir = fixture, split = "train")))
    assert((json \ "processed").extract[Long] == 3)
    assert((json \ "duplicates" \ "total").extract[Long] == 0)
    assert((json \ "excluded_duplicates").extract[Long] == 0)
  }

  test("test split: exact duplicate flags on second sight only (trap #1)") {
    val json = parse(RunDetectors.run(spark,
      RunDetectors.Config(dataDir = fixture, split = "test",
        freqQueries = Seq("URGENT", "missingterm"))))
    // conv3: "urgent transfer fund bank account" at t=119000 and t=119200
    // are identical → the LATER one scores 1.0; the first never flags
    assert((json \ "processed").extract[Long] == 3)
    assert((json \ "duplicates" \ "total").extract[Long] == 1)
    val rate = (json \ "duplicates" \ "rate").extract[Double]
    assert(math.abs(rate - 1.0 / 3) < 1e-9)
    // probe case-folds (T8): URGENT counts the 'urgent' occurrences
    assert((json \ "frequency_estimates" \ "URGENT").extract[Long] == 2)
    assert((json \ "frequency_estimates" \ "missingterm").extract[Long] == 0)
  }

  test("exclude-duplicates removes flagged messages from counts (trap #2)") {
    val json = parse(RunDetectors.run(spark,
      RunDetectors.Config(dataDir = fixture, split = "test", excludeDuplicates = true)))
    assert((json \ "processed").extract[Long] == 2)
    assert((json \ "excluded_duplicates").extract[Long] == 1)
    assert((json \ "duplicates" \ "total").extract[Long] == 0)
  }

  test("snapshots only at completed intervals (3 msgs @ interval 100 -> none; @ 1 -> 3)") {
    val none = parse(RunDetectors.run(spark,
      RunDetectors.Config(dataDir = fixture, split = "test")))
    assert((none \ "periodic_snapshots").extract[List[JValue]].isEmpty)
    val each = parse(RunDetectors.run(spark,
      RunDetectors.Config(dataDir = fixture, split = "test", updateInterval = 1)))
    assert((each \ "periodic_snapshots").extract[List[JValue]].length == 3)
  }

  test("unknown argument fails fast; flags parse like the reference CLI") {
    intercept[IllegalArgumentException](RunDetectors.parseArgs(Array("--bogus")))
    val c = RunDetectors.parseArgs(Array(
      "--data-dir", "/x", "--split", "train", "--max-messages", "7",
      "--freq-query", "a", "--freq-query", "b", "--exclude-duplicates"))
    assert(c.dataDir == "/x" && c.split == "train" && c.maxMessages == 7)
    assert(c.freqQueries == Seq("a", "b") && c.excludeDuplicates)
  }
}
