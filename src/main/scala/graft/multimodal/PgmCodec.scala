package graft.multimodal

/** Pluggable media codec boundary for the decode stage. `Multimodal`'s
  * mapPartitions pipeline is codec-agnostic: any [[Codec]] slots into the
  * same batched per-partition loop, so swapping the toy PGM codec below for
  * a JNI image/audio library is a one-line change at the call site — the
  * schema, batching, and partitioning stay identical.
  */
trait Codec {
  def name: String
  def decode(bytes: Array[Byte]): Decoded
}

/** A decoded single-channel image: dimensions, declared max sample value,
  * and the pixel raster (row-major, one Int per sample). */
final case class Decoded(width: Int, height: Int, maxVal: Int, pixels: Array[Int])

/** Real, pure-JVM codec for binary PGM (Portable GrayMap, magic "P5") —
  * the netpbm format: ASCII header `P5 <width> <height> <maxval>` with
  * `#` comments and whitespace separators, then a raw raster of
  * width×height samples (1 byte each for maxval ≤ 255).
  *
  * This is the container-friendly "real codec" for the decode path:
  * `decode` actually parses a public image format, validates its header,
  * and returns the raster — so every downstream feature is a function of
  * real decoded pixels and can be cross-checked by an oracle that
  * re-derives the same pixels independently. Heavy formats (JPEG, FLAC,
  * H.264) would implement the same [[Codec]] trait via JNI.
  */
object PgmCodec extends Codec {
  val name = "pgm"

  /** Deterministically wrap a payload as a P5 image: fixed width, however
    * many rows the payload fills, zero-padded to complete the last row.
    * This is the synthetic "camera" for testdata (documents ship text, not
    * media); because the mapping payload→image is pure byte arithmetic,
    * a SQL oracle can reproduce every decoded-pixel statistic from the
    * payload without running the codec. */
  def encode(payload: Array[Byte], width: Int = 16): Array[Byte] = {
    require(width > 0, "width must be positive")
    val height = (payload.length + width - 1) / width
    val header = s"P5\n$width $height\n255\n".getBytes("US-ASCII")
    val raster = java.util.Arrays.copyOf(payload, width * height)
    header ++ raster
  }

  /** Strict P5 parser. Throws IllegalArgumentException on a bad magic,
    * malformed header, out-of-range maxval, or truncated raster — decode
    * errors must surface, not produce garbage features. */
  def decode(b: Array[Byte]): Decoded = {
    var i = 0
    def skipSeparators(): Unit = {
      var go = true
      while (go && i < b.length) {
        val c = b(i).toChar
        if (c == '#') { while (i < b.length && b(i) != '\n'.toByte) i += 1 }
        else if (c.isWhitespace) i += 1
        else go = false
      }
    }
    def token(): String = {
      skipSeparators()
      val start = i
      while (i < b.length && !b(i).toChar.isWhitespace) i += 1
      require(i > start, s"pgm: truncated header at byte $start")
      new String(b, start, i - start, "US-ASCII")
    }
    require(token() == "P5", "pgm: not a binary PGM (magic != P5)")
    val width = token().toInt
    val height = token().toInt
    val maxVal = token().toInt
    require(width > 0 && height >= 0, s"pgm: bad dimensions ${width}x$height")
    require(maxVal >= 1 && maxVal <= 255, s"pgm: unsupported maxval $maxVal")
    i += 1 // exactly one whitespace byte separates maxval from the raster
    // Long arithmetic: a hostile header like 65536x65536 overflows Int to
    // n <= 0, which would slip past the truncation check and return an
    // empty raster instead of throwing — strictness is the contract here.
    val nL = width.toLong * height
    require(nL <= Int.MaxValue, s"pgm: raster too large (${width}x$height)")
    val n = nL.toInt
    require(b.length - i >= n, s"pgm: raster truncated (${b.length - i} < $n)")
    val pixels = new Array[Int](n)
    var j = 0
    while (j < n) { pixels(j) = b(i + j) & 0xff; j += 1 }
    Decoded(width, height, maxVal, pixels)
  }
}
