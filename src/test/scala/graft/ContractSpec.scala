package graft

/** The approximate-family contract queries (sketch_*_contract,
  * stream_dgim_contract, sim_ann_contract, mm_decode_integrity) hard-gate
  * their sketches through the driver's DuckDB oracle at sf0.01; this spec
  * pins the same all-booleans-true invariant at sf0.001 so a contract
  * break is caught by `sbt test` before a driver round. */
class ContractSpec extends SparkSpec {

  private val contracts = Seq(
    "sketch_cms_contract", "sketch_bloom_contract", "sketch_hll_contract",
    "sketch_quantile_contract", "stream_dgim_contract", "sim_ann_contract",
    "mm_decode_integrity")

  contracts.foreach { name =>
    test(s"$name: every contract boolean is true at sf0.001") {
      val df = SparkEntry.queries(name)(spark, sf001)
      val boolCols = df.schema.fields
        .filter(_.dataType == org.apache.spark.sql.types.BooleanType)
        .map(_.name)
      assert(boolCols.nonEmpty, s"$name has no boolean contract columns")
      val rows = df.collect()
      assert(rows.nonEmpty, s"$name returned no rows")
      rows.foreach { r =>
        boolCols.foreach { c =>
          assert(r.getAs[Boolean](c), s"$name: $c is false in row $r")
        }
      }
      spark.catalog.clearCache()
    }
  }
}
