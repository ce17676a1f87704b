package graft

import org.apache.spark.sql.functions._

/** Streaming DGIM burst estimates vs exact sliding counts: the DGIM
  * contract (never undercounts the recent window; bounded overcount)
  * must survive the flatMapGroupsWithState round-trip, including the
  * snapshot/restore state encoding. */
class DgimBurstStreamSpec extends SparkSpec {

  test("stream_dgim_burst estimates dominate exact recent counts") {
    val est = graft.streaming.StreamingOps.dgimBurstRaw(spark, sf001)
      .collect().map(r => r.getAs[String]("token") ->
        (r.getAs[Long]("recent_est"), r.getAs[Long]("prev_est"))).toMap
    assert(est.nonEmpty)
    // exact recent-25-arrival count per token (clock = doc_id)
    val docs = graft.Tables.documents(spark, sf001)
    val maxDoc = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val exact = docs
      .select(col("doc_id"), explode(graft.functions.Text.tokens(col("text"))).as("token"))
      .filter(col("doc_id") > maxDoc - 25)
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (tok, truth) =>
      est.get(tok).foreach { case (recent, _) =>
        assert(recent >= truth - 1,
          s"DGIM recent estimate must not undercount: $tok est=$recent truth=$truth")
      }
    }
  }

  test("snapshot/restore round-trips the DGIM exactly") {
    val d = new graft.streaming.Dgim(50)
    (1 to 200).foreach { t => d.advanceTo(t); if (t % 3 == 0) d.addOne() }
    val copy = new graft.streaming.Dgim(50)
    copy.restore(d.snapshot)
    Seq(50, 25, 10).foreach(k => assert(copy.countLast(k) == d.countLast(k)))
    copy.advanceTo(201); d.advanceTo(201)
    copy.addOne(); d.addOne()
    assert(copy.countLast(50) == d.countLast(50))
  }
}
