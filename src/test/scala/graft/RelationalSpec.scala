package graft

import org.apache.spark.sql.functions._

/** Hand-computed expectations for operators whose semantics have sharp
  * edges (as-of direction, session gap boundary, rollup totals). */
class RelationalSpec extends SparkSpec {

  test("asof join: prior view only, strictly earlier, max (latest) id wins") {
    val rows = SparkEntry.queries("rel_asof_join")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("prior_view_id") < r.getAs[Long]("purchase_id"),
        "as-of match must be strictly earlier in event order")
    }
  }

  test("rollup: grand total row equals table count") {
    val out = SparkEntry.queries("rel_rollup")(spark, sf001).collect()
    val total = out.find(r => r.getString(0) == "ALL" && r.getString(1) == "ALL").get
    val nCust = graft.Tables.customer(spark, sf001).count()
    assert(total.getAs[Long]("n_cust") == nCust)
    // region subtotals sum to the grand total
    val regionRows = out.filter(r => r.getString(0) != "ALL" && r.getString(1) == "ALL")
    assert(regionRows.map(_.getAs[Long]("n_cust")).sum == nCust)
  }

  test("sessionize: session counts bounded by event counts") {
    val rows = SparkEntry.queries("rel_sessionize")(spark, sf001).collect()
    rows.foreach { r =>
      val sessions = r.getAs[Long]("n_sessions"); val events = r.getAs[Long]("n_events")
      assert(sessions >= 1 && sessions <= events)
    }
  }

  test("topk: global top-10 matches orderBy-desc head") {
    val topk = SparkEntry.queries("rel_topk_orders")(spark, sf001)
      .collect().map(_.getAs[Long]("o_orderkey"))
    val full = graft.Tables.orders(spark, sf001)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10).collect().map(_.getAs[Long]("o_orderkey"))
    assert(topk.sameElements(full))
  }

  test("format roundtrip: csv/json/orc checksums agree and match the source count") {
    val out = SparkEntry.queries("rel_format_roundtrip")(spark, sf001).collect()
    assert(out.map(_.getAs[String]("format")).toSeq == Seq("csv", "json", "orc"))
    val n = graft.Tables.orders(spark, sf001).count()
    assert(out.forall(_.getAs[Long]("n_rows") == n))
    // all three formats must reproduce the identical content checksum —
    // a timestamp-fraction loss or null/empty swap in any codec breaks it
    assert(out.map(_.getAs[Long]("content_sum")).distinct.length == 1)
  }
}
