package graft

import org.apache.spark.sql.functions._

/** Skew-handling mechanics: manual key salting produces identical results
  * to the plain join while splitting a hot key across partitions — the
  * technique to reach for when AQE's skew-join splitting can't apply
  * (e.g. broadcast-ineligible aggregations keyed on a hot value). */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals plain aggregation on a skewed key") {
    // build a skewed frame: key 0 carries 50k rows, others 100 each
    val skewed = spark.range(50000).select(lit(0L).as("k"), col("id").as("v"))
      .union(spark.range(100 * 20).select((col("id") % 20 + 1).as("k"), col("id").as("v")))
    val plain = skewed.groupBy(col("k"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap

    // two-stage salted aggregation: partial agg on (k, salt), final on k
    val SALTS = 8
    val salted = skewed
      .withColumn("salt", pmod(hash(col("v")), lit(SALTS)))
      .groupBy(col("k"), col("salt"))
      .agg(sum(col("v")).as("ps"), count(lit(1)).as("pn"))
      .groupBy(col("k"))
      .agg(sum(col("ps")).as("s"), sum(col("pn")).as("n"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap

    assert(salted == plain, "salting must not change results")
  }

  test("salted broadcast join equals plain join under a hot key") {
    val SALTS = 4
    val fact = spark.range(20000).select(lit(7L).as("k"), col("id").as("v"))
      .union(spark.range(1000).select((col("id") % 10).as("k"), col("id").as("v")))
    val dim = spark.range(20).select(col("id").as("k"),
      concat(lit("dim_"), col("id")).as("name"))

    val plain = fact.join(dim, "k").groupBy(col("name"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // salt the fact side, explode the dim side across all salt values
    val factS = fact.withColumn("salt", pmod(hash(col("v")), lit(SALTS)))
    val dimS = dim.withColumn("salt", explode(array((0 until SALTS).map(lit): _*)))
    val saltedJoin = factS.join(dimS, Seq("k", "salt")).groupBy(col("name"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(saltedJoin == plain, "salted join must not change results")
  }
}
