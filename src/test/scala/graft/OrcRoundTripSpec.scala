package graft

import org.apache.spark.sql.functions._

/** ORC source/sink round trip — the second columnar format a lakehouse
  * ingest layer must speak (same explicit-schema stance as CSV/JSON). */
class OrcRoundTripSpec extends SparkSpec {

  test("lineitem survives an ORC round trip bit-for-bit") {
    val out = TmpDirs.create("graft_orc").toString
    val orig = Tables.lineitem(spark, sf001)
    orig.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.schema == orig.schema, "ORC must preserve the schema exactly")
    assert(back.count() == orig.count())
    val key = Seq(col("l_orderkey"), col("l_linenumber"))
    val a = orig.orderBy(key: _*).collect()
    val b = back.orderBy(key: _*).collect()
    a.zip(b).foreach { case (x, y) => assert(x == y, s"row mismatch: $x vs $y") }
  }

  test("predicate pushdown reaches the ORC scan") {
    val out = TmpDirs.create("graft_orc2").toString
    Tables.orders(spark, sf001).write.mode("overwrite").orc(out)
    val plan = spark.read.orc(out)
      .filter(col("o_totalprice") > 100000.0)
      .select(col("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("o_totalprice"), s"filter not pushed:\n$plan")
  }
}
