package graft

import org.apache.spark.sql.functions._
import graft.functions.{Text, VectorExprs => V}

/** Parity net for the r15 native vector/shingle/hash expressions: each is
  * pinned ELEMENT- and BIT-exact against the declarative formulation it
  * replaced (same fold order, same double/long arithmetic), over seeded
  * random data including the dialect traps (unicode, supplementary-plane
  * chars, short/empty arrays). The declarative forms are themselves
  * oracle-pinned, so native ≡ declarative closes the chain.
  */
class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)

  test("graft_dot / graft_l2sq / graft_vsum ≡ declarative folds (float arrays, bit-exact)") {
    val rows = (1 to 300).map { _ =>
      val n = 1 + rnd.nextInt(8) * 8
      ((1 to n).map(_ => rnd.nextFloat() * 2 - 1),
        (1 to n).map(_ => rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("a", "b").select(
      V.graft_dot(col("a"), col("b")).as("nd"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("dd"),
      V.graft_l2sq(col("a"), col("b")).as("nl"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, v) => acc + v).as("dl"),
      V.graft_vsum(col("a")).as("ns"),
      aggregate(col("a"), lit(0.0), (acc, x) => acc + x.cast("double")).as("ds"))
      .collect()
    df.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "dot diverges")
      assert(r.getDouble(2) == r.getDouble(3), "l2sq diverges")
      assert(r.getDouble(4) == r.getDouble(5), "vsum diverges")
    }
  }

  test("graft_dot / graft_l2sq ≡ declarative folds (double arrays, bit-exact)") {
    val rows = (1 to 300).map { _ =>
      val n = 1 + rnd.nextInt(64)
      ((1 to n).map(_ => rnd.nextDouble() * 2 - 1),
        (1 to n).map(_ => rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("a", "b").select(
      V.graft_dot(col("a"), col("b")).as("nd"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("dd"),
      V.graft_l2sq(col("a"), col("b")).as("nl"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v).as("dl"))
      .collect()
    df.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "dot diverges")
      assert(r.getDouble(2) == r.getDouble(3), "l2sq diverges")
    }
  }

  test("null vector elements fail loudly, never read as garbage (r15 ADVICE #1)") {
    // parquet-sourced embeddings are containsNull=true by format default,
    // so the type check can't reject them — the element read must throw
    val df = Seq((Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](1.0, 2.0, 3.0)))
      .toDF("a", "b")
    def fails(c: org.apache.spark.sql.Column): Unit = {
      val e = intercept[Exception](df.select(c).collect())
      def chain(t: Throwable): Seq[Throwable] =
        Option(t).map(x => x +: chain(x.getCause)).getOrElse(Nil)
      assert(chain(e).exists(_.getMessage != null) &&
        chain(e).exists(t => Option(t.getMessage).exists(_.contains("null element"))),
        s"expected loud null-element failure, got $e")
    }
    fails(V.graft_dot(col("a"), col("b")))
    fails(V.graft_dot(col("b"), col("a")))
    fails(V.graft_l2sq(col("a"), col("b")))
    fails(V.graft_vsum(col("a")))
    fails(V.graft_vsub(col("a"), col("b")))
    fails(V.graft_vnorm_div(col("a"), lit(2.0)))
  }

  test("graft_eq_count ≡ declarative agreement fold on string signatures") {
    val alphabet = Seq("aa", "bb", "cc", "dd")
    val rows = (1 to 300).map { _ =>
      val n = rnd.nextInt(17)
      ((1 to n).map(_ => alphabet(rnd.nextInt(alphabet.size))),
        (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.size))))
    }
    val df = rows.toDF("a", "b").select(
      V.graft_eq_count(col("a"), col("b")).as("n"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v).as("d"))
      .collect()
    df.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("graft_eq_count on long arrays ≡ declarative fold, and ≡ the string count through xxhash64") {
    // the compact-signature prefilter branch (r18): position-aligned
    // xxhash64 twins must agree with the declarative fold, and — since
    // equal strings hash equal — the long-array count is >= the string
    // count on the same rows (equality holds absent 64-bit collisions,
    // which this fixture cannot produce)
    val alphabet = Seq("aa", "bb", "cc", "dd")
    val rows = (1 to 300).map { _ =>
      val n = rnd.nextInt(17)
      ((1 to n).map(_ => alphabet(rnd.nextInt(alphabet.size))),
        (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.size))))
    }
    def h(c: org.apache.spark.sql.Column) = transform(c, x => xxhash64(x))
    val df = rows.toDF("a", "b").select(
      V.graft_eq_count(h(col("a")), h(col("b"))).as("n"),
      aggregate(zip_with(h(col("a")), h(col("b")),
        (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v).as("d"),
      V.graft_eq_count(col("a"), col("b")).as("s"))
      .collect()
    df.foreach { r =>
      assert(r.getInt(0) == r.getInt(1), "long-array count vs declarative fold")
      assert(r.getInt(0) == r.getInt(2), "hash count must equal string count here")
    }
  }

  test("graft_shingles ≡ declarative transform-over-sequence for k=2..4, sizes 0..6") {
    val rows = (1 to 200).map { _ =>
      (1 to rnd.nextInt(7)).map(_ => s"w${rnd.nextInt(9)}")
    } :+ Seq.empty[String]
    Seq(2, 3, 4).foreach { k =>
      val df = rows.toDF("toks").select(
        V.graft_shingles(col("toks"), k).as("n"),
        Text.hofShinglesK(col("toks"), k).as("d"))
        .collect()
      df.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"shingle divergence at k=$k: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}"))
    }
  }

  test("graft_char_ngrams ≡ declarative substr chain (unicode + supplementary)") {
    val rows = Seq("", "ab", "abc", "abcd", "aé😀Ωz café", "naïve“q”",
      "mid\nline", "    ", "ab😀😀cd") ++
      (1 to 100).map(_ => (1 to rnd.nextInt(12)).map(_ =>
        "aé😀Ω z.,!"(rnd.nextInt(10))).mkString)
    val df = rows.toDF("t").select(
      V.graft_char_ngrams(col("t"), 3).as("n"),
      when(length(col("t")) >= 3,
        transform(sequence(lit(1), length(col("t")) - 2),
          i => col("t").substr(i, lit(3))))
        .otherwise(typedLit(Seq.empty[String])).as("d"))
      .collect()
    df.zip(rows).foreach { case (r, src) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"char-ngram divergence on <$src>: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
    }
  }

  test("graft_poly_hash ≡ declarative ascii fold (unicode + supplementary)") {
    val rows = Seq("", "a", "hello world", "aé😀Ωz", "café naïve",
      "x" * 500) ++
      (1 to 100).map(_ => (1 to rnd.nextInt(40)).map(_ =>
        "abcé😀Ω ."(rnd.nextInt(8))).mkString)
    val df = rows.toDF("t").select(
      V.graft_poly_hash(col("t"), 1000000007L).as("n"),
      aggregate(
        transform(split(col("t"), ""), c => ascii(c).cast("long")),
        lit(0L),
        (acc, x) => (acc * 31 + x) % 1000000007L).as("d"))
      .collect()
    df.zip(rows).foreach { case (r, src) =>
      assert(r.getLong(0) == r.getLong(1), s"poly-hash divergence on <$src>")
    }
  }

  test("graft_vsub / graft_vnorm_div ≡ declarative zip_with/transform (bit-exact, incl. zero norm)") {
    val rows = ((1 to 200).map { _ =>
      val n = 1 + rnd.nextInt(16) * 4
      ((1 to n).map(_ => rnd.nextFloat() * 2 - 1),
        (1 to n).map(_ => rnd.nextFloat() * 2 - 1))
    }) :+ ((1 to 8).map(_ => 0.0f), (1 to 8).map(_ => 0.0f)) // zero vector
    val nrm = sqrt(V.graft_dot(col("a"), col("a")))
    val df = rows.toDF("a", "b")
      .withColumn("ad", col("a").cast("array<double>"))
      .withColumn("bd", col("b").cast("array<double>"))
      .select(
        V.graft_vsub(col("ad"), col("bd")).as("ns"),
        zip_with(col("ad"), col("bd"), (x, y) => x - y).as("ds"),
        V.graft_vnorm_div(col("a"), nrm).as("nn"),
        transform(col("a"), x =>
          when(nrm === 0.0, lit(0.0)).otherwise(x.cast("double") / nrm)).as("dn"))
      .collect()
    df.foreach { r =>
      assert(r.getSeq[Double](0) == r.getSeq[Double](1), "vsub diverges")
      assert(r.getSeq[Double](2) == r.getSeq[Double](3), "vnorm_div diverges")
    }
  }

  test("graft_vsum over int/long arrays ≡ declarative 0L fold; graft_codepoints ≡ split+ascii") {
    val texts = Seq("", "abc", "aé😀Ωz café", "x" * 300) ++
      (1 to 60).map(_ => (1 to rnd.nextInt(20)).map(_ =>
        "abé😀 .,"(rnd.nextInt(7))).mkString)
    val df = texts.toDF("t").select(
      V.graft_codepoints(col("t")).as("nc"),
      transform(split(col("t"), ""), c => ascii(c)).as("dc"),
      V.graft_vsum(V.graft_codepoints(col("t")).cast("array<bigint>")).as("nsum"),
      aggregate(transform(split(col("t"), ""), c => ascii(c).cast("long")),
        lit(0L), (a, x) => a + x).as("dsum"))
      .collect()
    df.zip(texts).foreach { case (r, src) =>
      if (src.isEmpty) {
        // DELIBERATE divergence, pinned: split('', '') yields [''] (one
        // empty cell, ascii 0) while the true code-point array of '' is
        // []. The declarative waveform chain therefore KEPT empty-text
        // rows (n=1) that its own DuckDB twin (WHERE length(text) > 0)
        // drops — a latent twin divergence the native form closes; green
        // oracles across r8-r14 prove empty text never occurs in data.
        assert(r.getSeq[Int](0) == Seq.empty[Int])
        assert(r.getSeq[Int](1) == Seq(0))
      } else {
        assert(r.getSeq[Int](0) == r.getSeq[Int](1), s"codepoints diverge on <$src>")
        assert(r.getLong(2) == r.getLong(3), s"long vsum diverges on <$src>")
      }
    }
  }

  test("packed char ngrams: pack→unpack round-trips the string ngram exactly") {
    import spark.implicits._
    // pack(21-bit cps) must be bijective with the string trigrams from
    // graft_char_ngrams — including multi-byte and supplementary-plane
    // code points — so groupBy(packed) ≡ groupBy(string) in ta_char_ngrams
    val docs = (Tables.documents(spark, sf001).select(col("text"))
      union Seq("héllo wörld", "𝕊up𝕡ort", "abc", "ab", "ααβγδ").toDF("text"))
      .filter(length(col("text")) >= 3)
    val rows = docs.select(
      V.graft_char_ngrams(col("text"), 3).as("s"),
      transform(V.graft_char_ngrams_packed(col("text"), 3),
        p => V.graft_unpack_ngram(p, 3)).as("u")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"packed ngrams diverge: ${r.getSeq[String](0).take(3)} vs ${r.getSeq[String](1).take(3)}")
    }
  }

  test("embeddings table: native norms match the declarative fold end-to-end") {
    val df = Tables.embeddings(spark, sf001)
      .select(
        sqrt(V.graft_dot(col("embedding"), col("embedding"))).as("n"),
        sqrt(aggregate(transform(col("embedding"),
          x => x.cast("double") * x.cast("double")), lit(0.0),
          (acc, v) => acc + v)).as("d"))
      .collect()
    assert(df.nonEmpty)
    df.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("span hashes clamp the byte walk on malformed UTF-8 (no over-read)") {
    import org.apache.spark.unsafe.types.UTF8String
    // Malformed sequences where toString's replacement-char code-point
    // count desyncs from the lead-byte-width byte walk — the r16 ADVICE
    // over-read shape: offsets past numBytes fed to hashUnsafeBytes.
    val cases = Seq(
      Array[Byte](0xE2.toByte, 0x82.toByte), // truncated 3-byte sequence
      Array[Byte]('a', 0xC3.toByte, 'b', 'c', 0xF0.toByte, 0x9F.toByte), // stray leads
      Array[Byte](0xFF.toByte, 0xFE.toByte, 'x', 'y', 'z'), // invalid lead bytes
      Array[Byte]('x', 0xE2.toByte, 0x82.toByte, 0xAC.toByte, 0xE2.toByte)) // valid € then truncated
    for (bytes <- cases; span <- 1 to 4) {
      val s = UTF8String.fromBytes(bytes)
      val str = s.toString
      val n = str.codePointCount(0, str.length)
      val out = graft.functions.GraftVec.spanHashes(s, span)
      assert(out.numElements() == math.max(n - span + 1, 0),
        s"span count wrong for ${bytes.toSeq} span=$span")
      // deterministic: the clamped/fallback path must be a pure function
      val again = graft.functions.GraftVec.spanHashes(s, span)
      assert((0 until out.numElements()).forall(i =>
        out.getLong(i) == again.getLong(i)))
    }
    // and a well-formed multi-byte string still takes the exact fast path
    // (pinned vs the substring shape the fallback uses)
    val good = UTF8String.fromString("héllo wörld €uro 𝕊pan")
    val ng = good.toString.codePointCount(0, good.toString.length)
    val fast = graft.functions.GraftVec.spanHashes(good, 3)
    assert(fast.numElements() == ng - 2)
  }
}
