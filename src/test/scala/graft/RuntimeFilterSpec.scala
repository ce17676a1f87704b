package graft

import org.apache.spark.sql.functions._

/** Runtime filtering (the 100 TB fact-scan reducer): when a selective
  * dimension join can't be broadcast, Catalyst can inject a Bloom filter
  * built from the dimension side into the fact scan
  * (spark.sql.optimizer.runtime.bloomFilter.*). This pins that the engine's
  * plain equi-join plans are eligible — the optimization composes with our
  * queries without any code change. */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim join gets a bloom runtime filter on the fact side") {
    val prev = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" ->
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled"),
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" ->
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // test tables are tiny; drop the size gates so injection applies, and
      // disable broadcast so the join actually shuffles (the scenario the
      // runtime filter exists for)
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
      // the application (fact) side must look "large" for injection to pay
      // off; the default gate is 10GB — drop it for the tiny test tables
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val dim = Tables.part(spark, sf001).filter(col("p_type") === "small").select(col("p_partkey"))
      val fact = Tables.lineitem(spark, sf001)
      val joined = fact.join(dim, fact("l_partkey") === dim("p_partkey"))
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("q"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("bloomfilter") ||
        optimized.contains("might_contain"),
        s"no runtime bloom filter injected:\n$optimized")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
