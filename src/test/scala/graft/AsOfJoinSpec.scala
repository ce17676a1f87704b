package graft

import org.apache.spark.sql.functions._
import graft.plans.AsOfJoin

/** The native as-of join operator (custom LogicalPlan + Strategy +
  * SparkPlan): semantics against a window-composed twin, edge cases the
  * merge must survive, and the physical plan shape. */
class AsOfJoinSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def leftDf: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, 10L, 100L),  // purchase after v@90 -> match 90
      (2L, 10L, 90L),   // equal timestamps: inclusive -> match 90
      (3L, 10L, 50L),   // before any view -> null
      (4L, 20L, 100L),  // user with no views -> null
      (5L, 30L, 100L)   // user only in left -> null
    ).toDF("pid", "user", "pts")
  }

  private def rightDf: DataFrame = {
    import spark.implicits._
    Seq(
      (101L, 10L, 60L),
      (102L, 10L, 90L),
      (103L, 40L, 10L)   // user only in right: never emitted
    ).toDF("vid", "vuser", "vts")
  }

  private def run(l: DataFrame, r: DataFrame) =
    AsOfJoin(l, r, "user", "vuser", "pts", "vts", "pid", "vid")
      .select(col("pid"), col("vid"))
      .collect().map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toMap

  test("as-of semantics: latest right with time <= left time, outer nulls") {
    val got = run(leftDf, rightDf)
    assert(got == Map(1L -> 102L, 2L -> 102L, 3L -> -1L, 4L -> -1L, 5L -> -1L))
  }

  test("result is partitioning-invariant") {
    val got = run(leftDf.repartition(7, col("pts")), rightDf.repartition(3, col("vid")))
    assert(got == Map(1L -> 102L, 2L -> 102L, 3L -> -1L, 4L -> -1L, 5L -> -1L))
  }

  test("empty right side yields all-null matches; empty left yields nothing") {
    val emptyR = rightDf.filter(lit(false))
    assert(run(leftDf, emptyR).values.forall(_ == -1L))
    val emptyL = leftDf.filter(lit(false))
    assert(run(emptyL, rightDf).isEmpty)
  }

  test("null keys and null times never match") {
    import spark.implicits._
    val l = Seq((1L, Option(10L), Option(100L)), (2L, Option.empty[Long], Option(100L)),
      (3L, Option(10L), Option.empty[Long]))
      .toDF("pid", "user", "pts")
    val r = Seq((101L, Option(10L), Option(90L)), (102L, Option.empty[Long], Option(50L)),
      (103L, Option(10L), Option.empty[Long]))
      .toDF("vid", "vuser", "vts")
    val got = AsOfJoin(l, r, "user", "vuser", "pts", "vts", "pid", "vid")
      .select(col("pid"), col("vid"))
      .collect().map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    assert(got == Map(1L -> 101L, 2L -> -1L, 3L -> -1L))
  }

  test("physical plan uses AsOfJoinExec with one exchange per side") {
    val plan = AsOfJoin(leftDf, rightDf, "user", "vuser", "pts", "vts", "pid", "vid")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom exec missing:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2,
      s"expected exactly two hash exchanges:\n$plan")
  }

  test("matches the window-composed equivalent on the real events table") {
    val ev = Tables.events(spark, sf001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("vid"), col("user_id").as("vuser"), col("ts").as("vts"))
    val native = AsOfJoin(purchases, views, "user_id", "vuser", "ts", "vts", "pid", "vid")
      .select(col("pid"), col("vid")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // composed twin: range join + keep latest per purchase
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pid")).orderBy(col("vts").desc, col("vid").desc)
    val composed = purchases.join(views,
        col("user_id") === col("vuser") && col("vts") <= col("ts"), "left")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("pid"), col("vid")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(native == composed)
    assert(native.nonEmpty)
  }

  test("property: agrees with the composed twin on random data (dups, ties, hot keys)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { round =>
      // key space 4 incl. one hot key; times in 0..20 => plenty of
      // duplicate (key, time) pairs on the right, exercising the tie-break
      val nl = 50 + rnd.nextInt(100)
      val nr = 50 + rnd.nextInt(100)
      def key() = if (rnd.nextInt(3) == 0) 7L else rnd.nextInt(4).toLong
      val l = (1 to nl).map(i => (i.toLong, key(), rnd.nextInt(20).toLong)).toDF("pid", "user", "pts")
      val r = (1 to nr).map(i => (i.toLong + 1000, key(), rnd.nextInt(20).toLong)).toDF("vid", "vuser", "vts")
      val native = AsOfJoin(l, r, "user", "vuser", "pts", "vts", "pid", "vid")
        .select(col("pid"), col("vid")).collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("pid")).orderBy(col("vts").desc, col("vid").desc)
      val composed = l.join(r, col("user") === col("vuser") && col("vts") <= col("pts"), "left")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("pid"), col("vid")).collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
      assert(native == composed, s"round $round mismatch")
      assert(native.size == nl)
    }
  }
}
