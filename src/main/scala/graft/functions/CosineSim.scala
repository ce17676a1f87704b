package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two float vectors.
  *
  * Why an Expression and not a UDF or higher-order-function fold: the
  * zip_with+aggregate formulation pays per-element Catalyst expression
  * dispatch (~50× slower measured at sf0.1), and a Scala UDF pays
  * serialization in and out of the row format. This expression reads the
  * unsafe array data in place and emits a tight primitive loop through
  * `doGenCode`, so it stays inside WholeStageCodegen.
  *
  * Accumulation order (single left-to-right pass for dot and both norms)
  * matches the engine's documented fold semantics, keeping results
  * bit-identical to the declarative formulation and the DuckDB oracle.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<float>, array<float>), got (${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // ragged lengths FAIL LOUDLY: silently truncating to the common
    // prefix (the old min()) produced a cosine over a different vector
    // space than the DuckDB oracle's full-length fold, surfacing as
    // opaque hash mismatches instead of an error (r10 review finding)
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"cosine_sim: vector lengths differ (${x.numElements()} vs ${y.numElements()})")
    val n = x.numElements()
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi"); val denom = ctx.freshName("denom")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  throw new IllegalArgumentException(
         |    "cosine_sim: vector lengths differ (" + $x.numElements() +
         |    " vs " + $y.numElements() + ")");
         |}
         |int $n = $x.numElements();
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $x.getFloat($i);
         |  double $yi = (double) $y.getFloat($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |${ev.value} = ($denom == 0.0) ? 0.0 : ($dot / $denom);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

object CosineSim {
  /** Register on a session (idempotent); Column.expr is gone in Spark 4, so
    * the Column API routes through the function registry + call_function. */
  def register(s: SparkSession): Unit =
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", es => CosineSim(es(0), es(1)), "built-in")

  /** Column-API entry point (requires register(spark) or GraftExtensions). */
  def cosine_sim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
}

/** Session extension registering graft's native functions for SQL use
  * (`SELECT cosine_sim(a, b) ...`). Installed by Verify/Bench/tests via
  * `SparkSession.builder().withExtensions(new GraftExtensions)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSim(children(0), children(1))))
    // tier-(c) custom operator: the native as-of join's planner strategy
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
