package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.storage.StorageLevel

/** Memoized `persist()` for per-query stats/anchor frames.
  *
  * The dedup/text query entry points persist (some eagerly, some
  * corpus-sized DISK_ONLY) intermediate frames with no matching
  * unpersist. That is safe under the bench/verify harnesses — they run
  * `clearCache()` between queries — but a direct or repeated
  * programmatic caller accumulated one eagerly-filled cached copy per
  * invocation for the JVM lifetime (r16 ADVICE; the exact failure mode
  * the r9 ADVICE fixed in `Similarity.cachedCorpusFrame`).
  *
  * This generalizes that fix to arbitrary input frames by keying on the
  * frame's own canonicalized logical plan: identical canonical plan ≡
  * identical result, so sharing the cached frame is sound, and distinct
  * corpora (e.g. the spec suites' synthetic frames) get distinct
  * entries. If an external `clearCache` dropped the blocks, the SAME
  * frame is re-persisted rather than duplicated, and `eager` re-runs the
  * materialization-barrier count on every (re)persist so true-stats join
  * planning (see `Dedup.exactCore`) still reads real cached sizes.
  *
  * Session identity is part of the key (a DataFrame is bound to the
  * session that built it, and test suites cycle sessions within one
  * JVM); entries of stopped sessions are purged on each access so dead
  * sessions' plans don't pin memory for the JVM lifetime.
  */
private[graft] object FrameCache {
  private val frames =
    scala.collection.concurrent.TrieMap.empty[String, (SparkSession, LogicalPlan, DataFrame)]

  /** Return a persisted frame for `df`, memoized per (session, plan).
    *
    * @param eager run a `count()` whenever the frame is (re)persisted —
    *              both a materialization barrier (concurrent jobs over a
    *              lazy cache race to fill it and recompute the lineage in
    *              parallel) and the true-stats source for join planning.
    */
  def cached(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
      eager: Boolean = false): DataFrame = {
    frames.filterInPlace { case (_, (sess, _, _)) => !sess.sparkContext.isStopped }
    val s = df.sparkSession
    val plan = df.queryExecution.analyzed.canonicalized
    val k = s"${System.identityHashCode(s)}|${plan.semanticHash()}"
    // identityHashCode is not unique across a GC'd-then-reallocated
    // session, and semanticHash can collide — verify the stored SESSION
    // and PLAN identity, not just the key (the cachedCorpusFrame
    // convention), and rebind to the caller's frame on mismatch
    val f = frames.get(k) match {
      case Some((sess, p, cachedDf)) if (sess eq s) && p == plan => cachedDf
      case _ =>
        frames.put(k, (s, plan, df))
        df
    }
    if (f.storageLevel == StorageLevel.NONE) {
      f.persist(level)
      if (eager) f.count()
    }
    f
  }

  /** [[cached]] with the eager materialization-barrier count. */
  def eager(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    cached(df, level, eager = true)
}
