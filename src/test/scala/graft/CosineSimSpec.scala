package graft

import org.apache.spark.sql.functions._
import graft.functions.CosineSim.cosine_sim

/** Native cosine_sim expression: interpreted eval == codegen eval == the
  * declarative HOF fold, plus SQL registration via GraftExtensions. */
class CosineSimSpec extends SparkSpec {
  import spark.implicits._
  graft.functions.CosineSim.register(spark)

  private val pairs = Seq(
    (Array(1f, 0f, 0f), Array(1f, 0f, 0f)),
    (Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
    (Array(1f, 2f, 3f), Array(-1f, -2f, -3f)),
    (Array(0f, 0f, 0f), Array(1f, 2f, 3f)),
    (Array(0.5f, -0.25f, 2f), Array(1.5f, 0.75f, -0.5f)))

  test("cosine_sim matches the zip_with/aggregate fold bit-for-bit") {
    val df = pairs.toDF("a", "b")
      .withColumn("native", cosine_sim(col("a"), col("b")))
      .withColumn("fold",
        try_divide(
          aggregate(zip_with(col("a"), col("b"),
            (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v),
          sqrt(aggregate(col("a"), lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))) *
            sqrt(aggregate(col("b"), lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))))
    df.collect().foreach { r =>
      val native = r.getAs[Double]("native")
      if (r.isNullAt(r.fieldIndex("fold"))) assert(native == 0.0) // zero vector
      else assert(native == r.getAs[Double]("fold"), s"native=$native")
    }
  }

  test("expected values on unit vectors") {
    val out = pairs.toDF("a", "b").select(cosine_sim(col("a"), col("b"))).as[Double].collect()
    assert(out(0) == 1.0)
    assert(out(1) == 0.0)
    assert(math.abs(out(2) + 1.0) < 1e-12)
    assert(out(3) == 0.0)
  }

  test("cosine_sim is usable from SQL once registered") {
    val r = spark.sql("SELECT cosine_sim(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)), array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)))")
      .collect()(0).getDouble(0)
    assert(r == 1.0)
  }

  test("ragged vector lengths fail loudly, never silently truncate (r10)") {
    // silent prefix truncation produced a cosine over a different vector
    // space than the oracle's full-length fold — both the interpreted and
    // the codegen path must throw
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)), " +
        "array(CAST(1 AS FLOAT)))").collect()
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | "))
    assert(rootMsg(e).contains("vector lengths differ"), rootMsg(e))
  }
}
