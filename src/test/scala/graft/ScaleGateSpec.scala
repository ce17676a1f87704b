package graft

/** ScaleGate watch-mode staging contract (r17 verdict #2): the gate must
  * stage every table a selected query actually touches — the judge's
  * `SCALE_QUERIES=dedup_embed_cosine,...` selection without
  * `SPARK_GRAFT_SCALE_FULL=1` used to die mid-sweep on PATH_NOT_FOUND
  * because watch mode staged only `documents`. Detection is the Tables
  * read recorder sampled while the query is BUILT. */
class ScaleGateSpec extends SparkSpec {

  test("touchedTables: documents-only query reports exactly documents") {
    assert(ScaleGate.touchedTables(spark, "text_top_tokens", sf001) == Set("documents"))
  }

  test("touchedTables: the judge's crash case reports embeddings") {
    // dedup_embed_cosine reads the embeddings table (via the fit-once
    // pair artifact) — the table watch mode failed to stage
    val t = ScaleGate.touchedTables(spark, "dedup_embed_cosine", sf001)
    assert(t.contains("embeddings"), s"got $t")
  }

  test("touchedTables: relational query reports its star-schema tables") {
    val t = ScaleGate.touchedTables(spark, "rel_join_multiway_revenue", sf001)
    assert(t.contains("lineitem") && t.contains("orders"), s"got $t")
    assert(!t.contains("documents"), s"got $t")
  }

  test("touchedTables: streaming intake reports documents (via stage-as-dir + index key)") {
    val t = ScaleGate.touchedTables(spark, "stream_incremental_intake", sf001)
    assert(t == Set("documents"), s"got $t")
  }

  test("recordReads: disarmed outside the block") {
    val t = Tables.recordReads { Tables.documents(spark, sf001); () }
    assert(t == Set("documents"))
    // a read AFTER the block must not throw or record anywhere
    Tables.nation(spark, sf001)
  }
}
