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

  test("merge upsert: base ⊕ delta equals latest-op state over the whole log") {
    // the CDC invariant the operator rests on, recomputed independently:
    // reduce the FULL changelog to its latest op per key (window form,
    // not the operator's max_by aggregate), drop latest-op deletes
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    val expected = graft.Tables.events(spark, sf001)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("event_type") =!= "error")
      .select(col("user_id"), round(col("value"), 2).as("value"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("value")).toMap
    val merged = SparkEntry.queries("rel_merge_upsert")(spark, sf001).collect()
    assert(merged.map(_.getAs[Long]("user_id")).toSet == expected.keySet,
      "merged key set must equal the latest-op key set of the full log")
    merged.foreach { r =>
      assert(r.getAs[Double]("value") == expected(r.getAs[Long]("user_id")),
        "merged value must be the latest op's value")
    }
    // deletes never surface, and the dense fixture exercises update+insert
    // (every key sees delta ops at sf0.001, so 'carry' may legitimately be
    // absent — the key-set equality above already proves carry semantics)
    val actions = merged.map(_.getAs[String]("action")).toSet
    assert(actions.subsetOf(Set("carry", "insert", "update")), s"unexpected actions $actions")
    assert(actions.contains("update"), s"expected update actions, got $actions")
  }

  test("incremental agg: merged partials equal a flat recompute") {
    val out = SparkEntry.queries("rel_incremental_agg")(spark, sf001).collect()
    val flat = graft.Tables.orders(spark, sf001)
      .groupBy(year(col("o_orderdate")).as("yr"), col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2).as("rev"))
      .collect()
      .map(r => (r.getAs[Int]("yr"), r.getAs[String]("priority")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("rev"))).toMap
    assert(out.length == flat.size, "merged rollup must cover every (year, priority) group")
    out.foreach { r =>
      val (n, rev) = flat((r.getAs[Int]("yr"), r.getAs[String]("priority")))
      assert(r.getAs[Long]("n_orders") == n)
      assert(r.getAs[Double]("revenue") == rev,
        "decimal partial merge must be bit-equal to the flat recompute")
    }
  }

  test("zscore outliers keep NULL event_type rows in their own stats group") {
    import spark.implicits._
    // The NULL group is 40 zeros + one 100: a >2.5-sigma outlier iff the
    // stats join carries the NULL event_type group (the oracle's
    // PARTITION BY semantics). A null-unsafe equi-join silently drops
    // the whole group instead (r16 ADVICE).
    val nullRows = (1L to 40L).map(i => (i, None: Option[String], 0.0)) :+
      ((41L, None: Option[String], 100.0))
    val typed = (100L to 140L).map(i => (i, Option("view"), 0.0)) :+
      ((141L, Option("view"), 100.0))
    val events = (nullRows ++ typed).toDF("event_id", "event_type", "value")
    val out = graft.ops.Relational.zscoreOutliersCore(events).collect()
    assert(out.length == 2, s"expected exactly the two outliers, got ${out.toSeq}")
    val ids = out.map(_.getLong(0)).toSet
    assert(ids == Set(41L, 141L),
      "the NULL event_type outlier must survive the stats join")
    assert(out.find(_.getLong(0) == 41L).get.isNullAt(1))
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
