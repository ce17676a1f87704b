package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{FakeDecoder, MediaMeta, MediaRecord}

/** Multimodal plumbing: the decode stage is a stub (no codecs in the
  * container), but schema, batching, and distribution are real — these
  * tests pin the parts that survive a real-codec swap. */
class MultimodalSpec extends SparkSpec {

  test("decode is deterministic and batch-shape-independent") {
    val rec = MediaRecord(7L, "hello multimodal world".getBytes("UTF-8"),
      MediaMeta("synthetic://x/7", "en", 22))
    assert(FakeDecoder.decode(rec) == FakeDecoder.decode(rec))
    val ds = Multimodal.mediaRecords(spark, sf001)
    val f1 = Multimodal.extractFeatures(ds, batchSize = 1).collect().sortBy(_.id)
    val f64 = Multimodal.extractFeatures(ds, batchSize = 64).collect().sortBy(_.id)
    assert(f1.sameElements(f64), "batch size must not change features")
  }

  test("frame count and byte length are consistent") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaRecords(spark, sf001))
      .collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.n_frames == (f.n_bytes + 255) / 256)
      assert(f.fake_width >= 1 && f.fake_width <= 1920)
      assert(f.fake_height >= 1 && f.fake_height <= 1080)
      assert(f.entropy_milli >= 0)
    }
  }
}
