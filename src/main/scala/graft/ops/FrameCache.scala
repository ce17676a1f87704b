package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
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
  * frame is re-persisted rather than duplicated.
  *
  * Source-file invalidation (r17 ADVICE): two reads of the same parquet
  * path canonicalize EQUAL (`InMemoryFileIndex` equality is by root
  * paths), so plan identity alone would serve a memoized frame — whose
  * file LISTING was captured at first analysis — even after the dataset
  * was regenerated at that path. Each entry therefore also records its
  * file sources' (path, mtime, size) snapshot (the `Tables.datasetKey`
  * convention); a hit whose snapshot no longer matches the files on disk
  * is unpersisted and rebound to the caller's fresh read.
  *
  * Session identity is part of the key (a DataFrame is bound to the
  * session that built it, and test suites cycle sessions within one
  * JVM); entries of stopped sessions are purged on each access so dead
  * sessions' plans don't pin memory for the JVM lifetime.
  *
  * Storage level is first-caller-wins on a shared plan (no current
  * caller pair requests different levels for the same frame; a later
  * caller's level is ignored rather than re-persisted — repersisting
  * would drop warm blocks mid-query).
  */
private[graft] object FrameCache {
  /** One memoized frame: the analyzed-plan identity, its file-source
    * snapshot, and whether the eager materialization-barrier count has
    * run since the last persist (r17 ADVICE: a lazily-registered entry
    * later requested eagerly must still get the barrier). */
  private final class Entry(
      val session: SparkSession,
      val plan: LogicalPlan,
      val df: DataFrame,
      val paths: Seq[String],
      val fingerprint: String) {
    @volatile var eagerDone: Boolean = false
  }

  private val frames = scala.collection.concurrent.TrieMap.empty[String, Entry]

  /** Root paths of every file-source relation in the analyzed plan —
    * the frames this cache must invalidate when their backing files
    * change. Non-file sources (spec-synthetic ranges, in-memory frames)
    * contribute nothing and stay keyed by plan alone. */
  private def rootPaths(analyzed: LogicalPlan): Seq[String] =
    analyzed.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toUri)
        case _ => Nil
      }
    }.flatten.collect {
      // local files only: this engine's sources are local parquet; a
      // remote-scheme path contributes its name (still keyed) without a
      // driver-side stat call
      case u if u.getScheme == null || u.getScheme == "file" => u.getPath
      case u => u.toString
    }.distinct.sorted

  /** (path, mtime, size) snapshot — same triple as `Tables.datasetKey`,
    * so "regenerated at the same path" invalidates here exactly when it
    * invalidates the fit-once artifact caches. */
  private def fingerprintOf(paths: Seq[String]): String =
    paths.map { p =>
      val f = new java.io.File(p)
      s"$p|${f.lastModified}|${f.length}"
    }.mkString(";")

  /** Return a persisted frame for `df`, memoized per (session, plan,
    * source snapshot).
    *
    * @param eager guarantee the materialization-barrier `count()` has run
    *              on the persisted blocks — both a barrier (concurrent
    *              jobs over a lazy cache race to fill it and recompute the
    *              lineage in parallel) and the true-stats source for join
    *              planning. Runs at most once per persist: a re-persist
    *              (post-clearCache) or a lazy-then-eager call sequence
    *              re-arms it.
    */
  def cached(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
      eager: Boolean = false): DataFrame = {
    // Global lock covers only lookup/registration (driver-side map work +
    // file stats); the persist and the eager count — a full Spark JOB —
    // run under the ENTRY's lock, so concurrent callers serialize only
    // when sharing a frame (where the barrier is the point: they must not
    // race to fill the cache) and never behind an unrelated plan's job
    // (r18 ADVICE: the warm-up's concurrent fits and streaming
    // micro-batch threads all route through here).
    val entry = synchronized {
      frames.filterInPlace { case (_, e) => !e.session.sparkContext.isStopped }
      val s = df.sparkSession
      val analyzed = df.queryExecution.analyzed
      val plan = analyzed.canonicalized
      val k = s"${System.identityHashCode(s)}|${plan.semanticHash()}"
      // identityHashCode is not unique across a GC'd-then-reallocated
      // session, and semanticHash can collide — verify the stored SESSION
      // and PLAN identity, not just the key (the cachedCorpusFrame
      // convention), and rebind to the caller's frame on mismatch
      def rebind(): Entry = {
        val paths = rootPaths(analyzed)
        val e = new Entry(s, plan, df, paths, fingerprintOf(paths))
        frames.put(k, e)
        e
      }
      frames.get(k) match {
        case Some(e) if (e.session eq s) && e.plan == plan =>
          if (fingerprintOf(e.paths) == e.fingerprint) e
          else {
            // dataset regenerated at the same path: the memoized frame's
            // captured file listing is stale — drop its blocks and serve
            // the caller's fresh read (r17 ADVICE). unpersist is
            // non-blocking: no job runs under the global lock.
            e.df.unpersist()
            rebind()
          }
        case _ => rebind() // vacant, or a hash collision: leave the other
                           // plan's frame persisted and take the slot
      }
    }
    entry.synchronized {
      val f = entry.df
      if (f.storageLevel == StorageLevel.NONE) {
        f.persist(level)
        entry.eagerDone = false
      }
      if (eager && !entry.eagerDone) {
        f.count()
        entry.eagerDone = true
      }
      f
    }
  }

  /** [[cached]] with the eager materialization-barrier count. */
  def eager(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    cached(df, level, eager = true)

  /** Memo for DRIVER-SIDE SCALARS derived from a frame (e.g. the
    * dictionary gates' duplication counts): unlike [[cached]] block
    * reuse, a scalar memo survives the harnesses' between-query
    * `clearCache()`, so a gate-measurement job runs once per dataset
    * instead of once per call.
    *
    * Keyed on the STABLE identity (session | canonical-plan hash) with
    * the source-file (path, mtime, size) snapshot stored as a validity
    * check — a regenerated dataset at the same path REPLACES its entry
    * instead of accreting a new one per fingerprint (r18 ADVICE: the
    * fingerprint-in-key scheme grew unboundedly in long-lived JVMs that
    * cycle datasets — spec suites, watch loops).
    *
    * semanticHash collisions can at worst serve a stale scalar to a
    * DIFFERENT plan — callers must use this only for perf decisions
    * whose both outcomes are correct. */
  private[graft] final class ScalarMemo[V] {
    private val m =
      scala.collection.concurrent.TrieMap.empty[String, (String, V)]
    def getOrCompute(df: DataFrame)(compute: => V): V = {
      val analyzed = df.queryExecution.analyzed
      val k = s"${System.identityHashCode(df.sparkSession)}|" +
        s"${analyzed.canonicalized.semanticHash()}"
      val fp = fingerprintOf(rootPaths(analyzed))
      m.get(k) match {
        case Some((f, v)) if f == fp => v
        case _ =>
          val v = compute
          m.put(k, (fp, v))
          v
      }
    }
    private[graft] def size: Int = m.size
  }
}
