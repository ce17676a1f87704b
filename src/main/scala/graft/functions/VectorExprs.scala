package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.GraftSqlShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native twins of the remaining interpreted per-element chains the r15
  * PlanAudit CodegenFallback detector inventoried (r14 verdict #6): the
  * `aggregate`/`zip_with` vector folds on the ANN probe paths, the
  * k-shingle builder, the minhash agreement count, the char-ngram
  * explode, and the polynomial rolling hash. Each computes the IDENTICAL
  * function as its declarative formulation (same element order, same
  * double/long arithmetic, left-to-right accumulation), pinned
  * element-exact in VectorExprsSpec; the DuckDB twins are untouched.
  *
  * Why not UDFs: a codegen'd `Expression` calling one static JVM method
  * per ROW stays inside WholeStageCodegen and reads Unsafe array data in
  * place — no per-ELEMENT Catalyst dispatch (the measured ~25 µs/element
  * CodegenFallback cliff), no serialization in and out of the row format.
  */
object GraftVec {

  /** Null elements FAIL LOUDLY (r16, r15 ADVICE #1): parquet-sourced
    * embedding arrays are containsNull=true by format default, so the
    * type check can't reject them — but getDouble/getFloat over a null
    * cell reads garbage/0 silently where the declarative folds these
    * expressions replace would propagate null. A null vector cell is data
    * corruption for every caller (same convention as ragged lengths);
    * the isNullAt bit-test is ~free and perfectly predicted on the
    * null-free hot path. */
  private def get(a: ArrayData, i: Int, isFloat: Boolean): Double = {
    if (a.isNullAt(i))
      throw new IllegalArgumentException(
        s"graft vector op: null element at index $i (null-free vectors required)")
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
  }

  /** Σ aᵢ·bᵢ in double, left-to-right — the `aggregate(zip_with(a, b,
    * (x, y) => x.cast(double) * y.cast(double)), 0.0, _+_)` fold.
    * Ragged lengths FAIL LOUDLY (CosineSim's r10 convention; the
    * declarative twin nulls instead, but a ragged pair is data
    * corruption for every caller — all vectors share one dim). */
  def dot(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"graft_dot: vector lengths differ ($n vs ${b.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) { acc += get(a, i, aF) * get(b, i, bF); i += 1 }
    acc
  }

  /** Σ (aᵢ−bᵢ)² in double, left-to-right — the squared-L2 fold of every
    * KNN/centroid probe. */
  def l2sq(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"graft_l2sq: vector lengths differ ($n vs ${b.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = get(a, i, aF) - get(b, i, bF)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Σ aᵢ in double, left-to-right — the `aggregate(a, 0.0, (acc, x) =>
    * acc + x.cast(double))` fold (vector stats, waveform means). */
  def vsum(a: ArrayData, aF: Boolean): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += get(a, i, aF); i += 1 }
    acc
  }

  /** Σ aᵢ over an integral array as LONG (wrapping exactly like the
    * declarative `aggregate(a, 0L, _+_)` fold — block sums). */
  def vsumLong(a: ArrayData, aInt: Boolean): Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_vsum: null element at index $i (null-free vectors required)")
      acc += (if (aInt) a.getInt(i).toLong else a.getLong(i))
      i += 1
    }
    acc
  }

  /** Code points of a string as array<int> — the `transform(split(s, ''),
    * ascii)` chain (Spark 4: split('') yields code-point clusters, ascii
    * the cluster's code point; probed + spec-pinned). */
  def codepoints(s: UTF8String): ArrayData = {
    val str = s.toString
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      out.add(Integer.valueOf(cp)): Unit
      i += Character.charCount(cp)
    }
    new GenericArrayData(out.toArray)
  }

  /** aᵢ−bᵢ as array<double>, the residual-vector builder
    * (`zip_with(a, b, (x, y) => x - y)`). Ragged lengths fail loudly. */
  def vsub(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): ArrayData = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"graft_vsub: vector lengths differ ($n vs ${b.numElements()})")
    val out = new Array[Any](n)
    var i = 0
    while (i < n) { out(i) = get(a, i, aF) - get(b, i, bF); i += 1 }
    new GenericArrayData(out)
  }

  /** aᵢ/d as array<double> with the zero-divisor guard — the L2
    * normalize (`transform(a, x => when(d === 0.0, 0.0).otherwise(
    * x.cast(double) / d))`): a zero vector has no direction and
    * normalizes to the zero vector. */
  def vnormDiv(a: ArrayData, d: Double, aF: Boolean): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = if (d == 0.0) 0.0 else get(a, i, aF) / d
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Count of positions with EQUAL string cells — the minhash signature
    * agreement numerator (`aggregate(zip_with(a, b, when(x === y, 1)
    * .otherwise(0)), 0, _+_)`). zip_with pads the shorter side with
    * nulls, which the when() counts 0, so only the overlap can agree —
    * min-length iteration is the same sum. */
  def eqCount(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var hits = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) &&
        a.getUTF8String(i) == b.getUTF8String(i)) hits += 1
      i += 1
    }
    hits
  }

  /** [[eqCount]] over long arrays — the compact-signature (per-position
    * xxhash64) prefilter twin used by the LSH index probe. */
  def eqCountLong(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var hits = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        hits += 1
      i += 1
    }
    hits
  }

  /** k-shingles joined by single spaces (duplicate_detector.py:7-13 —
    * the i-th shingle is toks[i..i+k-1]; fewer than k tokens → empty
    * array). Token cells are alpha-filtered upstream and never null. */
  def shingles(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[AnyRef](n - k + 1)
    var i = 0
    while (i + k <= n) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        val c = toks.getUTF8String(i + j)
        sb.append(if (c == null) "" else c.toString)
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Sliding char n-grams — `transform(sequence(1, len-(n-1)), i =>
    * substr(i, n))` natively. Spark string ops count CODE POINTS
    * (`substr` via substringSQL, `length` via numChars), so the loop
    * walks code-point boundaries, not UTF-16 units. Shorter than n
    * chars → empty array (the declarative sequence is empty). */
  def charNgrams(s: UTF8String, n: Int): ArrayData = {
    val total = s.numChars()
    if (total < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[AnyRef](total - n + 1)
    var i = 0
    while (i + n <= total) {
      out(i) = s.substringSQL(i + 1, n)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 16-bit perceptual average-hash over a string's code points in ONE
    * zero-allocation pass (r16): blk = numChars/16 code points per block,
    * block sums over the first 16·blk code points as exact longs, bit i
    * set iff 16·bᵢ > Σbⱼ — bit-identical to the declarative chain it
    * replaces (`graft_codepoints` → cast bigint → 16 × vsum(slice) →
    * cross-multiplied compare), which materialized a boxed per-CHAR array
    * plus 16 slice copies per row and dominated the 1000× sweep's
    * mm_dedup_cluster wall (303 s, ~linear in that garbage). ASCII rows
    * (the pinned corpus invariant) walk raw bytes; any non-ASCII byte
    * falls back to a full codePointAt walk — same values either way.
    * Fewer than 16 code points → 0L (callers filter length ≥ 16; the
    * declarative twin never sees such rows). */
  def avgHash16(s: UTF8String): Long = avgHashBlocks(s, 16)

  /** 64-bit perceptual average-hash — the [[avgHash16]] scheme at 64
    * blocks. Unlike the 16-bit hash, the value space is NOT enumerable
    * (no 696-mask neighborhood closure); its cluster consumer therefore
    * runs the distributed [[graft.ops.Dedup.components]] fixpoint. Bit 63
    * rides the sign bit (1L << 63 == Long.MinValue): OR of distinct
    * powers of two equals their arithmetic sum, which is how the DuckDB
    * twin reconstructs the same two's-complement value. */
  def avgHash64(s: UTF8String): Long = avgHashBlocks(s, 64)

  private def avgHashBlocks(s: UTF8String, nBlocks: Int): Long = {
    val nb = s.numBytes()
    var ascii = true
    var i = 0
    while (i < nb && ascii) { if (s.getByte(i) < 0) ascii = false; i += 1 }
    val sums = new Array[Long](nBlocks)
    if (ascii) {
      val blk = nb / nBlocks
      if (blk == 0) return 0L
      val limit = nBlocks * blk
      var p = 0
      while (p < limit) { sums(p / blk) += s.getByte(p); p += 1 }
    } else {
      val str = s.toString
      var nChars = 0
      var j = 0
      while (j < str.length) { nChars += 1; j += Character.charCount(str.codePointAt(j)) }
      val blk = nChars / nBlocks
      if (blk == 0) return 0L
      val limit = nBlocks * blk
      var p = 0
      j = 0
      while (p < limit) {
        val cp = str.codePointAt(j)
        sums(p / blk) += cp
        p += 1
        j += Character.charCount(cp)
      }
    }
    var total = 0L
    var k = 0
    while (k < nBlocks) { total += sums(k); k += 1 }
    var hash = 0L
    k = 0
    while (k < nBlocks) { if (sums(k) * nBlocks > total) hash |= (1L << k); k += 1 }
    hash
  }

  /** Code-point stream stats in one zero-allocation pass (r16, the
    * [[avgHash16]] lesson applied to the waveform chain): returns
    * [n_chars, Σcp, Σcp², max cp] as array<bigint>. Bit-identical to the
    * declarative `graft_codepoints` → cast(array<double>) → vsum/dot/
    * array_max chain it replaces: every partial sum is an exact integer
    * far below 2⁵³, so the double left-fold and the long accumulation
    * agree exactly after the final cast (spec-pinned). Empty string →
    * [0,0,0,0] (callers filter n > 0). */
  def cpStats(s: UTF8String): ArrayData = {
    val nb = s.numBytes()
    var ascii = true
    var i = 0
    while (i < nb && ascii) { if (s.getByte(i) < 0) ascii = false; i += 1 }
    var n = 0L
    var sum = 0L
    var sumsq = 0L
    var max = 0L
    if (ascii) {
      n = nb
      i = 0
      while (i < nb) {
        val c = s.getByte(i).toLong
        sum += c
        sumsq += c * c
        if (c > max) max = c
        i += 1
      }
    } else {
      val str = s.toString
      var j = 0
      while (j < str.length) {
        val cp = str.codePointAt(j)
        n += 1
        sum += cp
        sumsq += cp.toLong * cp
        if (cp > max) max = cp
        j += Character.charCount(cp)
      }
    }
    new GenericArrayData(Array[Any](n, sum, sumsq, max))
  }

  /** Distinct code points in one pass — the `size(array_distinct(
    * split(s, '')))` chain (which allocated one 1-char string per
    * character per row) natively. ASCII rows use a 128-bit bitset; any
    * non-ASCII byte falls back to a code-point HashSet. Spark 4 parity
    * pin: `split('', '')` yields [""] — one distinct cluster — so the
    * empty string returns 1 (spec-pinned). */
  def distinctCpCount(s: UTF8String): Int = {
    val nb = s.numBytes()
    if (nb == 0) return 1
    var ascii = true
    var i = 0
    while (i < nb && ascii) { if (s.getByte(i) < 0) ascii = false; i += 1 }
    if (ascii) {
      var lo = 0L
      var hi = 0L
      i = 0
      while (i < nb) {
        val b = s.getByte(i)
        if (b < 64) lo |= 1L << b else hi |= 1L << (b - 64)
        i += 1
      }
      java.lang.Long.bitCount(lo) + java.lang.Long.bitCount(hi)
    } else {
      val set = new java.util.HashSet[Integer]()
      val str = s.toString
      var j = 0
      while (j < str.length) {
        val cp = str.codePointAt(j)
        set.add(Integer.valueOf(cp)): Unit
        j += Character.charCount(cp)
      }
      set.size
    }
  }

  /** Polynomial rolling hash ((acc·31 + codepoint) mod 1e9+7, left fold)
    * — the `aggregate(transform(split(clean, ''), ascii), 0L, fold)`
    * chain. Spark 4's `split(_, '')` yields code-POINT clusters and
    * `ascii` returns the cluster's code point (probed empirically, spec-
    * pinned), so the fold walks code points. */
  def polyHash(s: UTF8String, mod: Long): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }

  /** Sliding n-character windows PACKED as code-point longs (21 bits per
    * code point, first code point in the highest bits; n·21 must fit 63
    * bits, so n ≤ 3) — the allocation-free twin of [[charNgrams]]: the
    * aggregation path groups 8-byte longs instead of one freshly-built
    * n-char string per character position; [[unpackNgram]] restores the
    * exact string for the few surviving rows. Packing is bijective on
    * code-point sequences, so groupBy(packed) ≡ groupBy(string). */
  def charNgramsPacked(s: UTF8String, n: Int): ArrayData = {
    require(n >= 1 && n * 21 <= 63, "packed ngram needs n*21 <= 63 bits")
    val str = s.toString
    var count = 0
    var j = 0
    while (j < str.length) { count += 1; j += Character.charCount(str.codePointAt(j)) }
    val nOut = count - n + 1
    if (nOut <= 0) return new GenericArrayData(Array.empty[Any])
    val cps = new Array[Int](count)
    var i = 0
    j = 0
    while (j < str.length) {
      val cp = str.codePointAt(j)
      cps(i) = cp
      i += 1
      j += Character.charCount(cp)
    }
    val out = new Array[Any](nOut)
    var p = 0
    while (p < nOut) {
      var packed = 0L
      var q = 0
      while (q < n) { packed = (packed << 21) | cps(p + q).toLong; q += 1 }
      out(p) = packed
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Inverse of [[charNgramsPacked]] for one value. */
  def unpackNgram(packed: Long, n: Int): UTF8String = {
    val sb = new java.lang.StringBuilder(n * 2)
    var q = n - 1
    while (q >= 0) {
      sb.appendCodePoint(((packed >> (21 * q)) & 0x1FFFFF).toInt)
      q -= 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** All sliding spanChars-character span hashes of s in one pass — the
    * `posexplode(sequence) → xxhash64(substr(text, pos+1, L))` chain
    * (Dedup.substringCoverage) without one UTF8String copy per span:
    * each hash is Spark's own XXH64 (seed 42) over the span's byte
    * range IN PLACE, so element i equals xxhash64(substr(s, i+1, L))
    * bit-for-bit (substr counts code points; the non-ASCII path walks a
    * code-point→byte offset table). Shorter-than-span strings return an
    * empty array (callers filter on length first). */
  def spanHashes(s: UTF8String, spanChars: Int): ArrayData = {
    val nb = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var ascii = true
    var i = 0
    while (i < nb && ascii) { if (s.getByte(i) < 0) ascii = false; i += 1 }
    if (ascii) {
      val nPos = nb - spanChars + 1
      if (nPos <= 0) return new GenericArrayData(Array.empty[Any])
      val out = new Array[Any](nPos)
      var p = 0
      while (p < nPos) {
        out(p) = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(base, off + p, spanChars, 42L)
        p += 1
      }
      new GenericArrayData(out)
    } else {
      // code-point walk: offs(c) = byte offset of code point c
      val str = s.toString
      var n = 0
      var j = 0
      while (j < str.length) { n += 1; j += Character.charCount(str.codePointAt(j)) }
      val nPos = n - spanChars + 1
      if (nPos <= 0) return new GenericArrayData(Array.empty[Any])
      val offs = new Array[Int](n + 1)
      var c = 0
      var b = 0
      // The byte walk trusts lead-byte widths while n came from
      // s.toString (which substitutes replacement chars for malformed
      // UTF-8) — on malformed input the two walks desync and an
      // unclamped offset could send hashUnsafeBytes past the buffer
      // (r16 ADVICE). Clamp every advance to nb, and if the walk didn't
      // land exactly on nb after n code points the input is malformed:
      // fall back to the bounds-checked substring path (the pre-r16
      // shape — substr counts code points inside UTF8String), whose
      // behavior on such degenerate input is the defined one.
      var desync = false
      while (c < n && !desync) {
        offs(c) = b
        if (b >= nb) desync = true
        else {
          val first = s.getByte(b)
          b += (if (first >= 0) 1
            else if ((first & 0xE0) == 0xC0) 2
            else if ((first & 0xF0) == 0xE0) 3
            else 4)
          if (b > nb) { b = nb; desync = true }
          c += 1
        }
      }
      if (desync || b != nb) {
        val out = new Array[Any](nPos)
        var p = 0
        while (p < nPos) {
          val sub = s.substringSQL(p + 1, spanChars)
          out(p) = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(sub.getBaseObject, sub.getBaseOffset, sub.numBytes(), 42L)
          p += 1
        }
        return new GenericArrayData(out)
      }
      offs(n) = nb
      val out = new Array[Any](nPos)
      var p = 0
      while (p < nPos) {
        out(p) = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(base, off + offs(p), offs(p + spanChars) - offs(p), 42L)
        p += 1
      }
      new GenericArrayData(out)
    }
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 16-bit SimHash over a token array in one pass — the
    * `explode(toks) → md5 → 16 × sum(when(substring(h,i,1) IN
    * ('8'..'f'), 1, -1)) → groupBy(doc_id)` chain (Dedup.simhash)
    * without the 1M-row explode or the doc_id re-shuffle. Bit i-1 of
    * the result is set iff the majority of the doc's tokens have the
    * high bit of hex digit i of md5(token) set; hex digit i (1-indexed)
    * of the digest is the high nibble of byte (i-1)/2 when i is odd,
    * the low nibble when even, so the vote tests bit 0x80 / 0x08 of
    * the byte — identical to the lowercase-hex membership test in
    * ('8','9','a'..'f'). md5 runs over the token's UTF-8 bytes, exactly
    * what Spark's `md5(string)` hashes. Empty arrays return 0L; the
    * caller filters them out first (the declarative explode dropped
    * token-less docs from the output entirely). Null elements throw,
    * the GraftVec ragged-input convention. */
  def simhash16(toks: ArrayData): Long = {
    val md = md5Local.get()
    val votes = new Array[Int](16)
    val n = toks.numElements()
    var t = 0
    while (t < n) {
      if (toks.isNullAt(t))
        throw new IllegalArgumentException(
          "graft_simhash16: null token at index " + t)
      val d = md.digest(toks.getUTF8String(t).getBytes)
      var b = 0
      while (b < 8) {
        if ((d(b) & 0x80) != 0) votes(2 * b) += 1 else votes(2 * b) -= 1
        if ((d(b) & 0x08) != 0) votes(2 * b + 1) += 1 else votes(2 * b + 1) -= 1
        b += 1
      }
      t += 1
    }
    var hash = 0L
    var i = 0
    while (i < 16) { if (votes(i) > 0) hash |= (1L << i); i += 1 }
    hash
  }

  /** "p|" prefixes for the 16 minhash permutations, pre-encoded. */
  private val mhPrefixes: Array[Array[Byte]] =
    Array.tabulate(16)(p => s"$p|".getBytes("UTF-8"))

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val d = (a(i) & 0xFF) - (b(i) & 0xFF)
      if (d != 0) return d < 0
      i += 1
    }
    a.length < b.length
  }

  private val hexChars = "0123456789abcdef".toCharArray

  private def hex16(d: Array[Byte]): UTF8String = {
    val c = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      c(2 * i) = hexChars((d(i) >> 4) & 0xF).toByte
      c(2 * i + 1) = hexChars(d(i) & 0xF).toByte
      i += 1
    }
    UTF8String.fromBytes(c)
  }

  /** 16-permutation MinHash signature over a shingle array in ONE fused
    * per-row pass — permutation p's value is the lexicographic MIN over
    * shingles of md5("p|" + shingle) as a lowercase hex string,
    * bit-identical to Spark's `md5(concat(lit("p|"), sh))` and DuckDB's
    * `md5('p|' || sh)` (hex order ≡ unsigned digest-byte order, compared
    * on raw digests here). Replaces the explode → distinct-shingle dict
    * join → 16-way min groupBy chain: a signature is a pure per-doc
    * function of its shingles, so hashing is MAP-ONLY — no
    * occurrence-scale shuffle, no SMJ sort spill (the dict-join chain
    * was ~9 GiB of spill and most of the wall in the 100× intake sweep).
    * Duplicate shingles are harmless (min is idempotent). Empty input →
    * empty array (callers filter; the groupBy chain produced no row). */
  def minhash16(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val md = md5Local.get()
    val mins = new Array[Array[Byte]](16)
    var i = 0
    while (i < n) {
      if (shingles.isNullAt(i))
        throw new IllegalArgumentException(
          "graft_minhash16: null shingle at index " + i)
      val sb = shingles.getUTF8String(i).getBytes
      var p = 0
      while (p < 16) {
        md.reset()
        md.update(mhPrefixes(p))
        md.update(sb)
        val d = md.digest()
        if (mins(p) == null || unsignedLess(d, mins(p))) mins(p) = d
        p += 1
      }
      i += 1
    }
    val out = new Array[Any](16)
    var p = 0
    while (p < 16) { out(p) = hex16(mins(p)); p += 1 }
    new GenericArrayData(out)
  }

  /** Winnowing fingerprint set in one pass — the char-position explode +
    * unrolled 8-step rolling hash + `min over (doc ORDER BY pos ROWS W-1
    * FOLLOWING)` + distinct chain (TextAnalysis.winnowingCore) without
    * materializing one row per character or sorting per doc. Gram
    * hash(pos) = left fold over the k code points at pos..pos+k-1 of
    * (acc*31 + cp) mod 1e9+7 (identical per-step modulo as the unrolled
    * `ascii(substr)` fold — Spark's ascii/substr are code-point exact,
    * probed and spec-pinned via polyHash); window minima over w
    * consecutive grams come from a monotonic deque; distinct minima are
    * emitted in first-seen order (set semantics — every consumer
    * aggregates or joins). Strings shorter than k+w-1 code points
    * return an empty array (callers filter on length first). */
  def winnowFps(s: UTF8String, k: Int, w: Int): ArrayData = {
    val str = s.toString
    // code-point walk (length() and substr() count code points)
    var n = 0
    var j = 0
    while (j < str.length) { n += 1; j += Character.charCount(str.codePointAt(j)) }
    val nGrams = n - (k - 1)
    val nWins = nGrams - (w - 1)
    if (nWins <= 0) return new GenericArrayData(Array.empty[Any])
    val cps = new Array[Int](n)
    var i = 0
    j = 0
    while (j < str.length) {
      val cp = str.codePointAt(j)
      cps(i) = cp
      i += 1
      j += Character.charCount(cp)
    }
    val hs = new Array[Long](nGrams)
    var p = 0
    while (p < nGrams) {
      var acc = 0L
      var q = 0
      while (q < k) { acc = (acc * 31 + cps(p + q)) % 1000000007L; q += 1 }
      hs(p) = acc
      p += 1
    }
    // sliding min via monotonic deque over windows [p, p+w-1]
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // [head, tail) holds indices with increasing hash
    p = 0
    while (p < nGrams) {
      while (tail > head && hs(deque(tail - 1)) >= hs(p)) tail -= 1
      deque(tail) = p
      tail += 1
      if (deque(head) <= p - w) head += 1
      if (p >= w - 1) seen.add(hs(deque(head)))
      p += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }
}

private[functions] trait VecBinary extends BinaryExpression {
  protected def opName: String
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$opName expects (array<float|double>, array<float|double>), " +
        s"got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = DoubleType
  protected def isF(e: Expression): Boolean =
    e.dataType == ArrayType(FloatType, containsNull = false) ||
      e.dataType == ArrayType(FloatType, containsNull = true)
}

/** Σ aᵢ·bᵢ — see [[GraftVec.dot]]. */
case class GraftDot(left: Expression, right: Expression) extends VecBinary {
  override protected def opName: String = "graft_dot"
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftVec.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isF(left), isF(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.GraftVec.dot($a, $b, ${isF(left)}, ${isF(right)})")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_dot"
}

/** Σ (aᵢ−bᵢ)² — see [[GraftVec.l2sq]]. */
case class GraftL2Sq(left: Expression, right: Expression) extends VecBinary {
  override protected def opName: String = "graft_l2sq"
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftVec.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isF(left), isF(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.GraftVec.l2sq($a, $b, ${isF(left)}, ${isF(right)})")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_l2sq"
}

/** Σ aᵢ — double result for float/double cells (see [[GraftVec.vsum]]),
  * long result for int/long cells (see [[GraftVec.vsumLong]] — exact
  * integer fold, wrapping identically to the declarative 0L fold). */
case class GraftVSum(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) |
        ArrayType(IntegerType, _) | ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_vsum expects array<float|double|int|long>, got $t")
  }
  private def elem: DataType = child.dataType.asInstanceOf[ArrayType].elementType
  override def dataType: DataType = elem match {
    case IntegerType | LongType => LongType
    case _ => DoubleType
  }
  override def nullSafeEval(v: Any): Any = elem match {
    case IntegerType => GraftVec.vsumLong(v.asInstanceOf[ArrayData], aInt = true)
    case LongType => GraftVec.vsumLong(v.asInstanceOf[ArrayData], aInt = false)
    case FloatType => GraftVec.vsum(v.asInstanceOf[ArrayData], aF = true)
    case _ => GraftVec.vsum(v.asInstanceOf[ArrayData], aF = false)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => elem match {
      case IntegerType => s"graft.functions.GraftVec.vsumLong($c, true)"
      case LongType => s"graft.functions.GraftVec.vsumLong($c, false)"
      case FloatType => s"graft.functions.GraftVec.vsum($c, true)"
      case _ => s"graft.functions.GraftVec.vsum($c, false)"
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_vsum"
}

/** Code points of a string as array<int> — see [[GraftVec.codepoints]]. */
case class GraftCodepoints(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_codepoints expects string, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    GraftVec.codepoints(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftVec.codepoints($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_codepoints"
}

/** Elementwise difference as array<double> — see [[GraftVec.vsub]]. */
case class GraftVSub(left: Expression, right: Expression) extends VecBinary {
  override protected def opName: String = "graft_vsub"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftVec.vsub(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isF(left), isF(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.GraftVec.vsub($a, $b, ${isF(left)}, ${isF(right)})")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_vsub"
}

/** Scalar divide with zero-guard as array<double> — see
  * [[GraftVec.vnormDiv]]. */
case class GraftVNormDiv(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _) | ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_vnorm_div expects (array<float|double>, double), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  private def isF: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def nullSafeEval(a: Any, d: Any): Any =
    GraftVec.vnormDiv(a.asInstanceOf[ArrayData], d.asInstanceOf[Double], isF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, d) =>
      s"graft.functions.GraftVec.vnormDiv($a, $d, $isF)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_vnorm_div"
}

/** Agreeing-position count over two array<string> signatures, or over
  * their compact array<long> per-position-hash twins (the LSH probe's
  * prefilter representation). */
case class GraftEqCount(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_eq_count expects two array<string> or two array<long>, got ($l, $r)")
    }
  override def dataType: DataType = IntegerType
  private def isLong: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    if (isLong) GraftVec.eqCountLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else GraftVec.eqCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      if (isLong) s"graft.functions.GraftVec.eqCountLong($a, $b)"
      else s"graft.functions.GraftVec.eqCount($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_eq_count"
}

/** k-shingles of a token array (k pinned at construction). */
case class GraftShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "shingle size must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    GraftVec.shingles(v.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftVec.shingles($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_shingles"
}

/** Sliding char n-grams of a string (n pinned at construction). */
case class GraftCharNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "ngram size must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_char_ngrams expects string, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    GraftVec.charNgrams(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftVec.charNgrams($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_char_ngrams"
}

/** Polynomial rolling hash of a string (modulus pinned at construction). */
/** Code-point stream stats [n, Σcp, Σcp², max] — see [[GraftVec.cpStats]]. */
case class GraftCpStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_cp_stats expects string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    GraftVec.cpStats(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftVec.cpStats($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_cp_stats"
}

/** Distinct code-point count — see [[GraftVec.distinctCpCount]]. */
case class GraftDistinctCpCount(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_distinct_cp_count expects string, got $t")
  }
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    GraftVec.distinctCpCount(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftVec.distinctCpCount($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_distinct_cp_count"
}

/** 16-bit perceptual average-hash of a string's code points — see
  * [[GraftVec.avgHash16]]. */
case class GraftAvgHash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_avg_hash expects string, got $t")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    GraftVec.avgHash16(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftVec.avgHash16($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_avg_hash"
}

/** 64-bit perceptual average-hash of a string's code points — see
  * [[GraftVec.avgHash64]]. */
case class GraftAvgHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_avg_hash64 expects string, got $t")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    GraftVec.avgHash64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftVec.avgHash64($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_avg_hash64"
}

case class GraftPolyHash(child: Expression, mod: Long) extends UnaryExpression {
  require(mod > 1, "modulus must be > 1")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_poly_hash expects string, got $t")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    GraftVec.polyHash(v.asInstanceOf[UTF8String], mod)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftVec.polyHash($c, ${mod}L)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_poly_hash"
}

/** See [[GraftVec.simhash16]]. */
case class GraftSimhash16(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash16 expects array<string>, got $t")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    GraftVec.simhash16(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftVec.simhash16($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_simhash16"
}

/** See [[GraftVec.minhash16]]. */
case class GraftMinhash16(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash16 expects array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    GraftVec.minhash16(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftVec.minhash16($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash16"
}

/** See [[GraftVec.charNgramsPacked]]. */
case class GraftCharNgramsPacked(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1 && n * 21 <= 63, "packed ngram needs n*21 <= 63 bits")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_char_ngrams_packed expects string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    GraftVec.charNgramsPacked(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftVec.charNgramsPacked($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_char_ngrams_packed"
}

/** See [[GraftVec.unpackNgram]]. */
case class GraftUnpackNgram(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1 && n * 21 <= 63, "packed ngram needs n*21 <= 63 bits")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_unpack_ngram expects bigint, got $t")
  }
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    GraftVec.unpackNgram(v.asInstanceOf[Long], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftVec.unpackNgram($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_unpack_ngram"
}

/** See [[GraftVec.spanHashes]]. */
case class GraftSpanHashes(child: Expression, span: Int)
    extends UnaryExpression {
  require(span >= 1, "span must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_span_hashes expects string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    GraftVec.spanHashes(v.asInstanceOf[UTF8String], span)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftVec.spanHashes($c, $span)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_span_hashes"
}

/** See [[GraftVec.winnowFps]]. */
case class GraftWinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, "k and w must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow_fps expects string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    GraftVec.winnowFps(v.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftVec.winnowFps($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_winnow_fps"
}

/** Column-API builders. */
object VectorExprs {
  def graft_dot(a: Column, b: Column): Column =
    GraftSqlShim.column(GraftDot(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))
  def graft_l2sq(a: Column, b: Column): Column =
    GraftSqlShim.column(GraftL2Sq(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))
  def graft_eq_count(a: Column, b: Column): Column =
    GraftSqlShim.column(GraftEqCount(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))
  def graft_vsum(a: Column): Column =
    GraftSqlShim.column(GraftVSum(GraftSqlShim.expression(a)))
  def graft_codepoints(s: Column): Column =
    GraftSqlShim.column(GraftCodepoints(GraftSqlShim.expression(s)))
  def graft_vsub(a: Column, b: Column): Column =
    GraftSqlShim.column(GraftVSub(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))
  def graft_vnorm_div(a: Column, d: Column): Column =
    GraftSqlShim.column(GraftVNormDiv(GraftSqlShim.expression(a), GraftSqlShim.expression(d)))
  def graft_shingles(toks: Column, k: Int): Column =
    GraftSqlShim.column(GraftShingles(GraftSqlShim.expression(toks), k))
  def graft_char_ngrams(s: Column, n: Int): Column =
    GraftSqlShim.column(GraftCharNgrams(GraftSqlShim.expression(s), n))
  def graft_poly_hash(s: Column, mod: Long): Column =
    GraftSqlShim.column(GraftPolyHash(GraftSqlShim.expression(s), mod))
  def graft_avg_hash(s: Column): Column =
    GraftSqlShim.column(GraftAvgHash(GraftSqlShim.expression(s)))
  def graft_avg_hash64(s: Column): Column =
    GraftSqlShim.column(GraftAvgHash64(GraftSqlShim.expression(s)))
  def graft_cp_stats(s: Column): Column =
    GraftSqlShim.column(GraftCpStats(GraftSqlShim.expression(s)))
  def graft_distinct_cp_count(s: Column): Column =
    GraftSqlShim.column(GraftDistinctCpCount(GraftSqlShim.expression(s)))
  def graft_simhash16(toks: Column): Column =
    GraftSqlShim.column(GraftSimhash16(GraftSqlShim.expression(toks)))
  def graft_minhash16(shingles: Column): Column =
    GraftSqlShim.column(GraftMinhash16(GraftSqlShim.expression(shingles)))
  def graft_winnow_fps(s: Column, k: Int, w: Int): Column =
    GraftSqlShim.column(GraftWinnowFps(GraftSqlShim.expression(s), k, w))
  def graft_span_hashes(s: Column, span: Int): Column =
    GraftSqlShim.column(GraftSpanHashes(GraftSqlShim.expression(s), span))
  def graft_char_ngrams_packed(s: Column, n: Int): Column =
    GraftSqlShim.column(GraftCharNgramsPacked(GraftSqlShim.expression(s), n))
  def graft_unpack_ngram(p: Column, n: Int): Column =
    GraftSqlShim.column(GraftUnpackNgram(GraftSqlShim.expression(p), n))
}
