package graft

import org.apache.spark.sql.functions._

/** Storage-layout scale mechanics: bucketed co-located joins (no shuffle of
  * either side) and partition-pruned reads — the plan shapes that matter at
  * 100 TB, asserted on the actual physical plans. */
class StorageLayoutSpec extends SparkSpec {

  private def physicalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("bucketed tables join without a shuffle exchange") {
    // warehouse dir is a static conf; use the default (gitignored) one and
    // clear both catalog entries and any orphaned table directories
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    Seq("li_b", "ord_b").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    Tables.lineitem(spark, sf001)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, sf001)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")
    // force the sort-merge path (at sf0.001 orders would be broadcast,
    // which bypasses bucketing entirely)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val plan = physicalPlan(joined)
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      // the bucketed sides must not re-shuffle on the join keys
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join must not re-shuffle join keys:\n$plan")
      // and it still computes the right answer
      val n = joined.agg(sum(col("n"))).collect()(0).getLong(0)
      assert(n == Tables.lineitem(spark, sf001).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
  }

  test("partitioned parquet sink prunes partitions on read") {
    val out = TmpDirs.create("graft_part").toString
    Tables.documents(spark, sf001)
      .write.partitionBy("lang").mode("overwrite").parquet(out)
    val pruned = spark.read.parquet(out).filter(col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"read must push the partition filter:\n$plan")
    val full = Tables.documents(spark, sf001).filter(col("lang") === "en").count()
    assert(pruned.count() == full)
  }

  test("ANN bucket-partitioned layout prunes unprobed buckets") {
    // the deployment story the sim_* scaladocs claim: lay the corpus out
    // partitioned by coarse cell (here the deterministic sign-LSH bucket
    // of the leading 4 dims — 16 cells), and a probe that searches
    // nprobe cells reads ONLY those directories, so per-query scan cost
    // is corpus_size × nprobe/cells instead of the full corpus
    val bucketExpr = (1 to 4).map(j =>
      when(element_at(col("embedding"), j) > 0f, lit(1 << (j - 1))).otherwise(0))
      .reduce(_ + _)
    val out = TmpDirs.create("graft_annpart").toString
    Tables.embeddings(spark, sf001)
      .withColumn("bucket", bucketExpr)
      .write.partitionBy("bucket").mode("overwrite").parquet(out)
    val probed = spark.read.parquet(out).filter(col("bucket").isin(3, 7, 11))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"probe must prune on the partition column:\n$plan")
    // only the probed cells' files are touched
    val touched = probed.select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(touched.nonEmpty && touched.forall(f =>
      f.contains("bucket=3") || f.contains("bucket=7") || f.contains("bucket=11")),
      s"scan escaped the probed cells: $touched")
    // and the pruned read equals the full-scan filter
    val full = Tables.embeddings(spark, sf001)
      .withColumn("bucket", bucketExpr).filter(col("bucket").isin(3, 7, 11)).count()
    assert(probed.count() == full)
  }

  test("selective scans push predicates into the parquet reader") {
    val df = SparkEntry.queries("rel_scan_filter")(spark, sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(l_quantity,45.0)"),
      s"filter must reach the scan:\n$plan")
  }

  test("z-order layout touches fewer files than linear sort for 2-dim ranges") {
    import org.apache.spark.sql.functions._
    def spread(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (0 until 8).map(i => shiftleft(shiftright(c, i).bitwiseAND(1), 2 * i)).reduce(_ + _)
    // two dimensions that both spread at sf0.001 (suppkey spans only 0..9)
    val base = Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), (col("l_partkey") % 64).as("px"),
        (col("l_orderkey") % 64).as("sy"))
      .withColumn("zval", spread(col("px")) + spread(col("sy")) * 2)
    def filesTouched(sorted: org.apache.spark.sql.DataFrame): Long = {
      val out = TmpDirs.create("graft_zorder").toString
      sorted.coalesce(1)
        .sortWithinPartitions(col("sortkey"))
        .withColumn("chunk", spark_partition_id()) // single sorted stream...
        .drop("chunk")
        .repartitionByRange(16, col("sortkey"))    // ...split into 16 ordered files
        .sortWithinPartitions(col("sortkey"))
        .write.mode("overwrite").parquet(out)
      spark.read.parquet(out)
        .filter(col("sy").between(10, 20))
        .select(input_file_name().as("f")).distinct().count()
    }
    val zFiles = filesTouched(base.withColumn("sortkey", col("zval")))
    // linear layout sorted px-major: perfect for px ranges, but a range on
    // the SECOND dimension scatters across every file — the failure mode
    // z-order exists to fix (both dimensions stay partially clustered)
    val linFiles = filesTouched(base.withColumn("sortkey", col("px") * 256 + col("sy")))
    assert(zFiles < linFiles,
      s"z-order should localize the non-leading dimension: z=$zFiles vs linear=$linFiles files")
  }

  test("epoch-shuffle writer lands one sorted file per shard, permutation intact") {
    val out = TmpDirs.create("graft_eshuffle").toString
    graft.ops.TextAnalysis.shuffleWriteTo(spark, sf001, out)
    val shardDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.nonEmpty, s"no shard directories under $out")
    // exactly one data file per shard: the shard was co-located in one
    // task and written as a single sorted stream
    shardDirs.foreach { dir =>
      val parts = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 1,
        s"${dir.getName}: expected exactly one parquet file, got ${parts.length}")
    }
    // in-file row order IS the permutation (each file is a single split at
    // this size, so collect order = physical file order)
    shardDirs.foreach { dir =>
      val skeys = spark.read.parquet(dir.toString)
        .select("skey").collect().map(_.getString(0))
      assert(skeys.sameElements(skeys.sorted),
        s"${dir.getName}: rows not in permutation-key order on disk")
    }
    // the durable write round-trips to the exact verification-twin
    // summary: same shards, counts, token mass, and order checksums
    val twin = SparkEntry.queries("ta_global_shuffle")(spark, sf001)
      .collect().map(_.toSeq).toSeq
    val written = SparkEntry.queries("ta_shuffle_write")(spark, sf001)
      .collect().map(_.toSeq).toSeq
    assert(written == twin, s"write path diverged from twin:\n$written\nvs\n$twin")
  }

  test("sub-sharded epoch-shuffle writer: N sorted files per shard, same checksums") {
    // the 100 TB form (r8 verdict #7): a petabyte shard cannot be one
    // task/file, so each shard splits into subShards contiguous RANGE
    // sub-bands of the same sort key — files read back in sub_shard order
    // must reproduce the exact shard permutation, pinned by checksum
    // equality with the non-materialized verification twin
    val subShards = 2
    val out = TmpDirs.create("graft_eshuffle_sub").toString
    graft.ops.TextAnalysis.shuffleWriteTo(spark, sf001, out, subShards)
    val shardDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.nonEmpty, s"no shard directories under $out")
    shardDirs.foreach { dir =>
      val subDirs = dir.listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("sub_shard="))
      assert(subDirs.length == subShards,
        s"${dir.getName}: expected $subShards sub_shard dirs, got ${subDirs.length}")
      // one sorted file per (shard, sub_shard)
      subDirs.foreach { sd =>
        val parts = sd.listFiles().filter(_.getName.endsWith(".parquet"))
        assert(parts.length == 1,
          s"${dir.getName}/${sd.getName}: expected one parquet file, got ${parts.length}")
        val skeys = spark.read.parquet(sd.toString)
          .select("skey").collect().map(_.getString(0))
        assert(skeys.sameElements(skeys.sorted),
          s"${dir.getName}/${sd.getName}: rows not in permutation-key order on disk")
      }
      // sub-bands are CONTIGUOUS slices of the shard's key order: max key
      // of sub k < min key of sub k+1, so concatenation in sub_shard
      // order is the shard permutation
      val bounds = subDirs.sortBy(_.getName).map { sd =>
        val ks = spark.read.parquet(sd.toString)
          .select("skey").collect().map(_.getString(0))
        (ks.min, ks.max)
      }
      bounds.sliding(2).foreach {
        case Array((_, hiPrev), (loNext, _)) =>
          assert(hiPrev < loNext,
            s"${dir.getName}: sub-shard ranges overlap ($hiPrev !< $loNext)")
        case _ =>
      }
    }
    // checksum equality with the verification twin: ordering by skey alone
    // within a shard equals ordering by (sub_shard, skey) because the
    // sub-bands are contiguous — the read-back summary must match exactly
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("skey"))
    val readBack = spark.read
      .schema("doc_id BIGINT, n_toks BIGINT, skey STRING, shard INT, sub_shard INT")
      .parquet(out)
      .withColumn("pos", row_number().over(w).cast("long"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("total_tokens"),
        sum(col("pos") * col("doc_id")).as("order_checksum"))
      .orderBy(col("shard"))
      .collect().map(_.toSeq).toSeq
    val twin = SparkEntry.queries("ta_global_shuffle")(spark, sf001)
      .collect().map(_.toSeq).toSeq
    assert(readBack == twin,
      s"sub-sharded write diverged from twin:\n$readBack\nvs\n$twin")
  }
}
