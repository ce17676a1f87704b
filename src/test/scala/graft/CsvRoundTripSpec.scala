package graft

import org.apache.spark.sql.functions._

/** CSV source/sink round trip with an explicit schema (never inferSchema —
  * same stance as the JSON ingest, SURVEY.md §1.3): values, nulls, and
  * delimiter-containing strings survive write → read. */
class CsvRoundTripSpec extends SparkSpec {

  test("orders survive a CSV round trip with explicit schema") {
    val out = TmpDirs.create("graft_csv").toString
    val orig = Tables.orders(spark, sf001)
      .withColumn("o_orderdate", col("o_orderdate").cast("date"))
    orig.write.mode("overwrite").option("header", "true").csv(out)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, " +
        "o_totalprice DOUBLE, o_orderdate DATE, o_orderpriority STRING")
    val back = spark.read.schema(schema).option("header", "true").csv(out)
    assert(back.count() == orig.count())
    val a = orig.orderBy(col("o_orderkey")).collect()
    val b = back.orderBy(col("o_orderkey")).collect()
    a.zip(b).foreach { case (x, y) => assert(x == y, s"row mismatch: $x vs $y") }
  }
}
