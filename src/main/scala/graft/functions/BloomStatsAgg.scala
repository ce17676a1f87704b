package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.util.sketch.BloomFilter

/** Custom typed Aggregator exposing what Spark's built-in Bloom aggregation
  * does not: the fill ratio (popcount/m) and insert count — SURVEY.md A6
  * (reference bloom_filter.py:65-73's `fill_ratio`). Spark's `BloomFilter`
  * has `bitSize()` but no popcount accessor, so `finish` serializes the
  * filter once and counts bits in the bit-array section.
  *
  * Buffer design: the filter rides as a Kryo-encoded OBJECT, mutated in
  * place by `reduce` — Spark's object-aggregation path only serializes the
  * buffer at shuffle boundaries, so per-row cost is the 7 hash probes, not
  * a 117 KiB round-trip. `merge` ORs two filters (exact for same m,k — the
  * same mergeability the reference's double-hash scheme has).
  */
object BloomStatsAgg {

  case class BloomStats(
      bit_size: Long, set_bits: Long, fill_ratio: Double,
      inserted: Long, approx_fpp: Double, k_hashes: Int)

  private val CAPACITY = 100000L // reference defaults (duplicate_detector.py:27-30)
  private val FPP = 0.01
  // NOTE: the hash count k is READ from the serialized filter header in
  // finish (bytes 4-8), never hardcoded — a CAPACITY/FPP change (or a
  // Spark version changing its optimal-k rounding) would silently
  // desynchronize a literal k from the filter's real hash count and make
  // approx_fpp = fill^k wrong with no error (r10 review finding; the
  // reference's k=7 at these dims is bloom_filter.py:28).

  /** m for the pinned (CAPACITY, FPP) dims — a pure constant of Spark's
    * sizing formula, exposed so the sketch_bloom_stats oracle can pin the
    * exact value as a literal instead of a magic number. */
  lazy val BIT_SIZE: Long = BloomFilter.create(CAPACITY, FPP).bitSize()

  final class Buf(var filter: BloomFilter, var inserted: Long) extends Serializable

  val agg: Aggregator[String, Buf, BloomStats] =
    new Aggregator[String, Buf, BloomStats] {
      override def zero: Buf = new Buf(BloomFilter.create(CAPACITY, FPP), 0L)

      override def reduce(b: Buf, a: String): Buf = {
        b.filter.put(a)
        b.inserted += 1
        b
      }

      override def merge(x: Buf, y: Buf): Buf = {
        x.filter.mergeInPlace(y.filter)
        x.inserted += y.inserted
        x
      }

      override def finish(b: Buf): BloomStats = {
        val bos = new java.io.ByteArrayOutputStream()
        b.filter.writeTo(bos)
        val bytes = bos.toByteArray
        // serialized layout: version(4) + numHashFunctions(4) + numWords(4)
        // + data words; popcount over the word section only, k from the
        // header so it is self-consistent with the filter by construction
        val k = java.nio.ByteBuffer.wrap(bytes, 4, 4).getInt
        val bits = bytes.drop(12).map(x => java.lang.Integer.bitCount(x & 0xff)).sum.toLong
        val m = b.filter.bitSize()
        val fill = bits.toDouble / m
        BloomStats(m, bits, fill, b.inserted, math.pow(fill, k), k)
      }

      override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
      override def outputEncoder: Encoder[BloomStats] = Encoders.product[BloomStats]
    }
}
