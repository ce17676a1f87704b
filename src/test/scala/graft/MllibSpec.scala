package graft

/** MLlib LSH variants, recall-checked against the engine's exact operators
  * at sf0.001 (not bench queries — see MllibOps Scaladoc for why MinHashLSH
  * is pathological on low-vocabulary corpora). */
class MllibSpec extends SparkSpec {

  test("MLlib MinHashLSH recovers every exact-jaccard near-dup pair") {
    val mllib = ops.MllibOps.minhashMllib(spark, sf001)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf001)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(mllib),
      s"MLlib LSH missed exact pairs: ${exact -- mllib}")
  }

  test("MLlib BRP ANN join returns plausible neighbor sets per query") {
    val rows = ops.MllibOps.annMllib(spark, sf001).collect()
    assert(rows.nonEmpty)
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (_, rs) =>
      rs.foreach(r => assert(r.getAs[Double]("euclid_dist") >= 0.0))
    }
  }
}
