package graft.streaming

import scala.collection.mutable.ArrayDeque

/** Faithful DGIM sliding-window 1-counter (SURVEY.md A7–A9; reference
  * streaming/algorithms/dgim.py:10-63): O(log² W) buckets per key instead of
  * O(W) raw history — the memory-bounded state a `flatMapGroupsWithState`
  * burst detector keeps per bin when exact ring buffers don't fit.
  *
  * Semantics pinned line-by-line to the reference:
  *  - buckets (timestamp, size), newest first (dgim.py:13);
  *  - `add_one`: prepend size-1 bucket, compress, then expire
  *    (dgim.py:40-44);
  *  - compress: scan newest→oldest counting buckets per size; when a size
  *    reaches 3, merge the two OLDEST of that size into one of double size
  *    keeping the NEWER timestamp, then restart the scan (dgim.py:20-38);
  *  - `tick`: advance time one event, expire buckets with
  *    ts < now − window + 1 (dgim.py:15-18,45-47) — one tick per MESSAGE,
  *    not per token (SURVEY.md fidelity trap #4);
  *  - `count_last(k)`: full size for buckets with ts ≥ now − k + 1; the
  *    first older bucket contributes size/2 (integer) and the scan stops
  *    (dgim.py:50-62).
  *
  * Standard DGIM bound: estimate within 50% of the true window count; the
  * property spec checks it against a brute-force window.
  */
final class Dgim(windowSize: Int) {
  private var now: Long = 0L
  // (timestamp, size), newest at index 0
  private val buckets = ArrayDeque.empty[(Long, Long)]

  def tick(): Unit = {
    now += 1
    expire()
  }

  def addOne(): Unit = {
    buckets.prepend((now, 1L))
    compress()
    expire()
  }

  private def expire(): Unit = {
    val expireBefore = now - windowSize + 1
    while (buckets.nonEmpty && buckets.last._1 < expireBefore)
      buckets.removeLast()
  }

  private def compress(): Unit = {
    var restart = true
    while (restart) {
      restart = false
      val seen = scala.collection.mutable.Map.empty[Long, Int]
      var i = 0
      while (i < buckets.length && !restart) {
        val size = buckets(i)._2
        val c = seen.getOrElse(size, 0) + 1
        seen(size) = c
        if (c == 3) {
          val idxs = buckets.indices.filter(j => buckets(j)._2 == size)
          val a = idxs(idxs.length - 2); val b = idxs.last
          val merged = (buckets(a)._1, size * 2) // newer timestamp of the two oldest
          buckets.remove(b)
          buckets.remove(a)
          buckets.insert(a, merged)
          restart = true
        }
        i += 1
      }
    }
  }

  /** Estimated count of 1s among the last k events (default: full window). */
  def countLast(k: Int = windowSize): Long = {
    if (k <= 0) return 0L
    val threshold = now - k + 1
    var total = 0L
    val it = buckets.iterator
    var stop = false
    while (it.hasNext && !stop) {
      val (ts, size) = it.next()
      if (ts >= threshold) total += size
      else { total += size / 2; stop = true }
    }
    total
  }

  def bucketCount: Int = buckets.length

  /** Jump the clock forward to arrival index t (for streams clocked by an
    * event index rather than unit ticks). */
  def advanceTo(t: Long): Unit =
    if (t > now) { now = t; expire() }

  /** Serializable state: (clock, buckets) — the flatMapGroupsWithState
    * round-trip encoding. */
  def snapshot: (Long, List[(Long, Long)]) = (now, buckets.toList)

  def restore(s: (Long, List[(Long, Long)])): Unit = {
    now = s._1
    buckets.clear()
    buckets ++= s._2
  }
}

/** One DGIM per bin (reference DGIMManager, dgim.py:66-80) — e.g. one per
  * CMS column in the burst detector. */
final class DgimManager(numBins: Int, windowSize: Int) {
  private val dgims = Array.fill(numBins)(new Dgim(windowSize))
  def tick(): Unit = dgims.foreach(_.tick())
  def addOne(bin: Int): Unit = dgims(bin).addOne()
  def countLast(bin: Int, k: Int): Long = dgims(bin).countLast(k)
  def countLast(bin: Int): Long = dgims(bin).countLast()
}
