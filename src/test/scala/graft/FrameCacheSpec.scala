package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The (session, canonicalized-plan)-memoized persist that replaced the
  * query entry points' bare persist() calls (r17, from the r16 ADVICE
  * leak): repeated programmatic calls must reuse ONE cached frame, a
  * harness clearCache must lead to a re-persist of the SAME frame (not a
  * duplicate), and distinct plans must get distinct entries. */
class FrameCacheSpec extends SparkSpec {
  import graft.ops.FrameCache

  private def frame(n: Long) =
    spark.range(n).select(col("id"), (col("id") % 7).as("k"))
      .groupBy(col("k")).agg(sum(col("id")).as("s"))

  test("identical plans share one persisted frame across calls") {
    val a = FrameCache.cached(frame(1000))
    val b = FrameCache.cached(frame(1000)) // structurally identical plan
    assert(a eq b, "second call must return the SAME memoized frame")
    assert(a.storageLevel != StorageLevel.NONE)
    // the leak shape this exists to prevent: N calls, N cached copies.
    // Reference equality of the returned frame means the cache manager
    // sees one plan, not an accumulating family of clones.
    (1 to 5).foreach(_ => assert(FrameCache.cached(frame(1000)) eq a))
  }

  test("clearCache drops blocks; next access re-persists the same frame") {
    val a = FrameCache.eager(frame(2000))
    assert(a.storageLevel != StorageLevel.NONE)
    spark.catalog.clearCache()
    assert(a.storageLevel == StorageLevel.NONE, "clearCache must unpersist")
    val b = FrameCache.eager(frame(2000))
    assert(b eq a, "post-clearCache access must rebind the SAME frame")
    assert(a.storageLevel != StorageLevel.NONE, "and re-persist it")
    assert(b.collect().length == 7)
  }

  test("distinct plans get distinct entries; levels honored") {
    val a = FrameCache.cached(frame(3000))
    val b = FrameCache.cached(frame(4000),
      StorageLevel.DISK_ONLY)
    assert(!(a eq b))
    // force materialization so the requested level is observable
    b.count()
    assert(b.storageLevel == StorageLevel.DISK_ONLY)
    assert(a.storageLevel != StorageLevel.NONE)
    // results stay correct through the cache
    assert(a.agg(sum(col("s"))).head.getLong(0) == (0L until 3000L).sum)
    assert(b.agg(sum(col("s"))).head.getLong(0) == (0L until 4000L).sum)
  }

  test("eager materializes at call time (true-stats barrier)") {
    val f = FrameCache.eager(frame(5000).filter(col("s") > Long.MinValue))
    // an eagerly-counted cache reports its level AND has filled blocks:
    // the planner reads real sizes from it when the frame feeds a join
    assert(f.storageLevel != StorageLevel.NONE)
    assert(spark.sparkContext.getRDDStorageInfo.exists(_.numCachedPartitions > 0),
      "eager must have FILLED cache blocks at call time, not lazily")
  }

  test("regenerating a dataset at the same path invalidates the entry") {
    // r17 ADVICE (medium): two reads of one parquet path canonicalize
    // EQUAL, so plan identity alone served the OLD memoized frame — with
    // its stale captured file listing — after the files were rewritten.
    val dir = TmpDirs.create("graft_fcache_regen")
    val p = dir.resolve("t.parquet").toString
    spark.range(10).select(col("id")).write.mode("overwrite").parquet(p)
    val a = FrameCache.eager(spark.read.parquet(p))
    assert(a.count() == 10)
    // regenerate at the SAME path with different contents; ensure the
    // (mtime, size) snapshot moves even on a coarse-mtime filesystem
    Thread.sleep(20)
    spark.range(25).select(col("id")).write.mode("overwrite").parquet(p)
    val b = FrameCache.eager(spark.read.parquet(p))
    assert(!(b eq a), "regenerated files must rebind, not serve the stale frame")
    assert(b.count() == 25, "the rebound frame must read the NEW files")
    // the stale frame's blocks were dropped and the fresh ones filled:
    // cache lookup is plan-keyed (the two reads canonicalize equal), so
    // even the OLD handle now resolves to the regenerated data
    assert(a.count() == 25, "stale blocks must not survive invalidation")
    // and the fresh entry memoizes as usual
    assert(FrameCache.eager(spark.read.parquet(p)) eq b)
  }

  test("eager on a lazily-registered entry still runs the barrier count") {
    // r17 ADVICE (low): if the first caller registered the plan via a
    // LAZY cached() and a later caller asks eager(), the barrier count
    // must still run — storageLevel != NONE alone must not skip it.
    spark.catalog.clearCache() // start from zero filled blocks session-wide
    def mk = frame(6000).filter(col("s") >= Long.MinValue + 1)
    val a = FrameCache.cached(mk) // lazy: persisted, but no blocks yet
    assert(a.storageLevel != StorageLevel.NONE)
    assert(spark.sparkContext.getRDDStorageInfo.forall(_.numCachedPartitions == 0),
      "lazy cached() must not have materialized")
    val b = FrameCache.eager(mk)
    assert(b eq a)
    assert(spark.sparkContext.getRDDStorageInfo.exists(_.numCachedPartitions > 0),
      "eager() after a lazy registration must run the barrier count")
  }

  test("concurrent callers on distinct plans don't serialize into deadlock") {
    // r18 ADVICE: the global monitor used to be held across persist AND
    // the eager count (a full Spark job), serializing every concurrent
    // caller behind it. The lock is now global-for-lookup, per-entry for
    // the job. This pins the two-lock design's safety: concurrent mixed
    // eager/lazy calls over distinct and shared plans complete, memoize
    // to single entries, and return correct results. (Lock ordering is
    // global→entry only, so deadlock is impossible by construction; this
    // exercises it under real contention.)
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(8)
    val start = new CountDownLatch(1)
    val sums = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    val futures = (0 until 8).map { i =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          val n = 7000 + (i % 4) * 100 // 4 distinct plans, each shared by 2 threads
          val f = FrameCache.eager(frame(n.toLong))
          sums.add((n, f.agg(sum(col("s"))).head.getLong(0)))
        }
      })
    }
    start.countDown()
    futures.foreach(f => f.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    sums.forEach { case (n, s) => assert(s == (0L until n.toLong).sum) }
    // shared plans memoized: 2 threads per plan returned the same frame
    (0 until 4).foreach { j =>
      val n = 7000 + j * 100
      val a = FrameCache.cached(frame(n.toLong))
      assert(a.storageLevel != StorageLevel.NONE)
    }
  }

  test("ScalarMemo replaces a superseded snapshot instead of accreting") {
    // r18 ADVICE: fingerprint-in-key scalar memos grew one entry per
    // dataset regeneration at the same path, unbounded in long-lived
    // JVMs. The memo now keys on the stable (session, plan) identity and
    // stores the file snapshot as a replace-on-mismatch validity check.
    val memo = new FrameCache.ScalarMemo[Long]
    val dir = TmpDirs.create("graft_scalar_memo")
    val p = dir.resolve("t.parquet").toString
    spark.range(10).write.mode("overwrite").parquet(p)
    var computes = 0
    def read() = spark.read.parquet(p)
    def count() = memo.getOrCompute(read()) { computes += 1; read().count() }
    assert(count() == 10 && computes == 1)
    assert(count() == 10 && computes == 1, "same snapshot must serve the memo")
    assert(memo.size == 1)
    Thread.sleep(20) // ensure the (mtime, size) snapshot moves
    spark.range(25).write.mode("overwrite").parquet(p)
    assert(count() == 25 && computes == 2,
      "a regenerated dataset must recompute, not serve the stale scalar")
    assert(memo.size == 1,
      "the superseded snapshot's entry must be REPLACED, not accreted")
  }
}
