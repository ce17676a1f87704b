package graft

/** The driver contract surface itself: entry() smoke (rows > 0 at sf0.001,
  * exactly what the driver checks), registry integrity (every oracle key
  * has a query; names are unique), and every query runs at sf0.001. */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("registry: every oracle key has a query; no duplicate names") {
    val qs = SparkEntry.queries
    val os = SparkEntry.oracleSql
    assert(os.keySet.subsetOf(qs.keySet), s"orphan oracles: ${os.keySet -- qs.keySet}")
    val names = SparkEntry.allSpecs.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
  }

  test("every registered query executes at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf001).count()
      assert(n >= 0, s"$name failed")
    }
  }
}
