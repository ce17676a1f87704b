package graft

import org.apache.spark.sql.functions._
import graft.functions.Text

class TextSpec extends SparkSpec {
  import spark.implicits._

  private def toks(s: String): Seq[String] =
    Seq(s).toDF("text").select(Text.tokens(col("text")).as("t"))
      .as[Seq[String]].head()

  test("tokens: lowercases, drops non-alpha and stopwords") {
    assert(toks("The Quick fox2 runs to the BARN") == Seq("quick", "runs", "barn"))
  }

  test("tokens: empty and all-stopword strings give empty arrays") {
    assert(toks("") == Seq.empty)
    assert(toks("the a an of") == Seq.empty)
  }

  test("tokens: consecutive spaces produce no empty tokens") {
    assert(toks("fox   runs") == Seq("fox", "runs"))
  }

  private def sh3(ts: Seq[String]): Seq[String] =
    Seq(Tuple1(ts)).toDF("toks").select(Text.shingles3(col("toks")).as("s"))
      .as[Seq[String]].head()

  test("shingles3: sliding 3-grams joined by space") {
    assert(sh3(Seq("a", "b", "c", "d")) == Seq("a b c", "b c d"))
  }

  test("shingles3: fewer than 3 tokens yields no shingles") {
    assert(sh3(Seq("a", "b")) == Seq.empty)
    assert(sh3(Seq.empty) == Seq.empty)
    assert(sh3(Seq("a", "b", "c")) == Seq("a b c"))
  }
}
