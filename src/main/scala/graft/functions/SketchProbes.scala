package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Native codegen'd probe expressions for the Spark-built sketches
  * (r10 verdict #3): `sketch_cms_*` / `sketch_bloom_*` used to probe a
  * broadcast sketch through a scalar Scala UDF — a per-row boxed call with
  * an encoder round-trip, the last interpreted hot loop in a corpus-scan
  * path. These expressions carry the SERIALIZED sketch as a foldable binary
  * literal child, deserialize it once at plan time (driver), ship it to
  * executors inside the codegen references array, and emit a direct method
  * call from generated code — the [[CosineSim]] pattern applied to sketch
  * probes, so the probe column stays inside WholeStageCodegen
  * (PlanShapeSpec's "sketch probes are native expressions" test asserts
  * no ScalaUDF in the sketch_cms_token_freq / sketch_cms_contract /
  * sketch_bloom_dedup plans, the three whose RETURNED frame contains the
  * probe; the bloom contracts probe inside intermediate counts, so their
  * returned literal frame can't carry the assertion).
  *
  * [[RefBloomMightContain]] extends the pattern to the blake2b-faithful
  * Bloom twin: its membership bits come from the same RefBloom JVM method
  * either way (fidelity is untouched), but the corpus-sized probe scans in
  * bloomFaithfulContract shed the UDF boxing/encoder round-trip.
  * [[RefCmsEstimate]] completes the family for the faithful CMS (r12
  * verdict #7): its 20-row post-limit probe frames gain nothing in speed,
  * but retiring the last scalar UDFs closes the "no ScalaUDF anywhere"
  * invariant — PlanAudit's allowlist is now empty and PlanShapeSpec
  * asserts the no-UDF shape across the whole sketch family.
  */
abstract class SketchProbe extends BinaryExpression {
  /** The serialized-sketch child; must be a foldable BinaryType literal. */
  def sketchBytes: Expression
  /** The probed item child (StringType). */
  def item: Expression
  override def left: Expression = sketchBytes
  override def right: Expression = item

  override def checkInputDataTypes(): TypeCheckResult =
    if (!sketchBytes.foldable || sketchBytes.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a foldable BINARY sketch literal as its first argument")
    else if (item.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a STRING probe value, got ${item.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  protected def bytes: Array[Byte] =
    sketchBytes.eval().asInstanceOf[Array[Byte]]
}

/** `cms_estimate(sketch_bytes, token)` → the Count-Min estimate of token's
  * frequency, from a serialized `org.apache.spark.util.sketch
  * .CountMinSketch` (the same object `df.stat.countMinSketch` builds, so
  * estimates are bit-identical to the old UDF path). */
case class CmsEstimate(sketchBytes: Expression, item: Expression) extends SketchProbe {
  override def dataType: DataType = LongType

  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  override def nullSafeEval(b: Any, it: Any): Any =
    cms.estimateCount(it.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", cms, classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, (_, it) =>
      s"${ev.value} = $ref.estimateCount($it.toString());")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(sketchBytes = l, item = r)
  override def prettyName: String = "cms_estimate"
}

/** `bloom_might_contain(sketch_bytes, key)` → Bloom membership from a
  * serialized `org.apache.spark.util.sketch.BloomFilter` (the object
  * `df.stat.bloomFilter` builds — string hashing identical to the old UDF
  * path, unlike the built-in `might_contain`, which probes LONG xxhash
  * keys from `bloom_filter_agg` and would change the membership bits). */
case class BloomMightContain(sketchBytes: Expression, item: Expression) extends SketchProbe {
  override def dataType: DataType = BooleanType

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def nullSafeEval(b: Any, it: Any): Any =
    bloom.mightContainString(it.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, it) =>
      s"${ev.value} = $ref.mightContainString($it.toString());")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(sketchBytes = l, item = r)
  override def prettyName: String = "bloom_might_contain"
}

/** `ref_bloom_might_contain(sketch_bytes, key)` → membership from a
  * Java-serialized [[RefSketches.RefBloom]] — the reference's
  * blake2b double-hash filter. The probe calls the SAME
  * `RefBloom.mightContain` the old UDF called (bit-identical membership;
  * fidelity is the object, not the call convention), but from generated
  * code, so corpus-sized probe scans stay inside WholeStageCodegen. */
case class RefBloomMightContain(sketchBytes: Expression, item: Expression)
    extends SketchProbe {
  override def dataType: DataType = BooleanType

  @transient private lazy val bloom: RefSketches.RefBloom = {
    val ois = new java.io.ObjectInputStream(new ByteArrayInputStream(bytes))
    try ois.readObject().asInstanceOf[RefSketches.RefBloom] finally ois.close()
  }

  override def nullSafeEval(b: Any, it: Any): Any =
    bloom.mightContain(it.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("refBloom", bloom,
      classOf[RefSketches.RefBloom].getName)
    nullSafeCodeGen(ctx, ev, (_, it) =>
      s"${ev.value} = $ref.mightContain($it.toString());")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(sketchBytes = l, item = r)
  override def prettyName: String = "ref_bloom_might_contain"
}

/** `ref_cms_estimate(sketch_bytes, token)` → frequency estimate from a
  * Java-serialized [[RefSketches.RefCms]] — the reference's blake2b 544×7
  * Count-Min table. Same `RefCms.estimate` the old UDF called (per-key
  * estimates bit-identical); the salts are @transient lazy on RefCms, so
  * each executor recomputes them once after deserialization. */
case class RefCmsEstimate(sketchBytes: Expression, item: Expression)
    extends SketchProbe {
  override def dataType: DataType = LongType

  @transient private lazy val cms: RefSketches.RefCms = {
    val ois = new java.io.ObjectInputStream(new ByteArrayInputStream(bytes))
    try ois.readObject().asInstanceOf[RefSketches.RefCms] finally ois.close()
  }

  override def nullSafeEval(b: Any, it: Any): Any =
    cms.estimate(it.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("refCms", cms,
      classOf[RefSketches.RefCms].getName)
    nullSafeCodeGen(ctx, ev, (_, it) =>
      s"${ev.value} = $ref.estimate($it.toString());")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(sketchBytes = l, item = r)
  override def prettyName: String = "ref_cms_estimate"
}

object SketchProbes {
  /** Register both probes on a session (idempotent — the CosineSim
    * registry + call_function route; Column(expr) is not public API in
    * Spark 4). */
  def register(s: SparkSession): Unit = {
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cms_estimate", es => CmsEstimate(es(0), es(1)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain", es => BloomMightContain(es(0), es(1)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ref_bloom_might_contain", es => RefBloomMightContain(es(0), es(1)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ref_cms_estimate", es => RefCmsEstimate(es(0), es(1)), "built-in")
  }

  private def javaSerialize(o: AnyRef): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(o); oos.close()
    bos.toByteArray
  }

  private def serialize(write: java.io.OutputStream => Unit): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    write(bos)
    bos.toByteArray
  }

  /** Column probe: CMS estimate of `token` under `cms`. */
  def cmsEstimate(s: SparkSession, cms: CountMinSketch, token: Column): Column = {
    register(s)
    call_function("cms_estimate", lit(serialize(cms.writeTo)), token)
  }

  /** Column probe: Bloom membership of `key` under `bloom`. A null
    * filter (the empty-history case — `stat.bloomFilter` over zero rows
    * yields an unusable sketch, so callers build null) means nothing was
    * ever inserted: membership is constantly false, not an NPE at
    * serialize time. */
  def bloomMightContain(s: SparkSession, bloom: BloomFilter, key: Column): Column =
    if (bloom == null) lit(false)
    else {
      register(s)
      call_function("bloom_might_contain", lit(serialize(bloom.writeTo)), key)
    }

  /** Column probe: membership of `key` under the blake2b-faithful
    * [[RefSketches.RefBloom]] (Java-serialized into the literal child —
    * a case class of four scalars + the bit array). */
  def refBloomMightContain(s: SparkSession, bloom: RefSketches.RefBloom,
      key: Column): Column = {
    register(s)
    call_function("ref_bloom_might_contain", lit(javaSerialize(bloom)), key)
  }

  /** Column probe: blake2b-faithful CMS frequency estimate of `token`
    * under the Java-serialized [[RefSketches.RefCms]]. */
  def refCmsEstimate(s: SparkSession, cms: RefSketches.RefCms,
      token: Column): Column = {
    register(s)
    call_function("ref_cms_estimate", lit(javaSerialize(cms)), token)
  }
}
