package graft

import org.apache.spark.sql.functions._

/** Edge-size and consistency properties of Relational.withGlobalRank —
  * the r12 RDD zipWithIndex rewrite (offsets pass + ranking pass over ONE
  * materialized shuffle). The properties asserted are exactly what the
  * r11 ReuseExchange form silently violated under full-suite state:
  * ranks must be the dense permutation 1..n agreeing with the total
  * order, for every size regime relative to the shuffle parallelism.
  */
class GlobalRankSpec extends SparkSpec {

  private def rank(n: Int) = {
    import spark.implicits._
    // duplicate-heavy first key (n/7 distinct values) + unique tiebreak:
    // exercises range-boundary ties, the case where an inconsistent
    // partitioning scrambles ranks hardest
    val df = (0 until n).map(i => ((i * 31) % math.max(1, n / 7), i))
      .toDF("k", "id")
    graft.ops.Relational.withGlobalRank(spark, df,
      Seq(col("k"), col("id")))
  }

  for (n <- Seq(0, 1, 2, 31, 32, 33, 97, 1000)) {
    test(s"rank is the dense 1..n permutation in total-order at n=$n") {
      val got = rank(n).orderBy(col("rank"))
        .select(col("k"), col("id"), col("rank"), col("n")).collect()
      assert(got.length == n)
      assert(got.forall(_.getLong(3) == n.toLong), "n column must equal total")
      assert(got.map(_.getLong(2)).toSeq == (1L to n.toLong), "dense 1..n")
      val keys = got.map(r => (r.getInt(0), r.getInt(1))).toSeq
      assert(keys == keys.sorted, "rank order must equal the total order")
    }
  }

  test("two independent evaluations rank identically (no sampling drift)") {
    // the r11 failure mode: independently planned passes sampled range
    // boundaries independently; the rewrite freezes boundaries in one
    // partitioner, so repeated full evaluations must agree exactly
    val a = rank(500).select(col("id"), col("rank")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val b = rank(500).select(col("id"), col("rank")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("reserved output names are rejected up front") {
    import spark.implicits._
    val df = Seq((1, 2)).toDF("rank", "x")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Relational.withGlobalRank(spark, df, Seq(col("x")))
    }
    assert(e.getMessage.contains("rank"))
  }
}
