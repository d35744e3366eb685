package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The [[RewriteIntervalJoin]] optimizer rule (installed session-wide via
  * GraftExtensions, which SparkTestBase's session loads): a naive
  * `abs(a.ts - b.ts) <= w` inner join must plan as a bucketed hash join,
  * produce exactly the brute-force result (boundaries, negatives, nulls),
  * and the rule must NOT fire where it could pessimize or change
  * semantics.
  */
class IntervalJoinRuleSpec extends SparkTestBase {

  private def events(ids: Seq[(Long, Long)], idCol: String, tsCol: String) = {
    import spark.implicits._
    ids.toDF(idCol, tsCol)
  }

  // deliberately awkward timestamps: negatives, zero-straddling, boundary
  private val left = Seq(
    (1L, -25L), (2L, -10L), (3L, 0L), (4L, 7L), (5L, 19L), (6L, 42L))
  private val right = Seq(
    (101L, -30L), (102L, -11L), (103L, 3L), (104L, 10L), (105L, 29L))
  private val W = 10L

  private def brute: Set[(Long, Long)] =
    (for {
      (a, ta) <- left
      (b, tb) <- right
      if math.abs(ta - tb) <= W
    } yield (a, b)).toSet

  test("naive abs-delta inner join plans as a hash join on buckets, result equals brute force") {
    val l = events(left, "a_id", "a_ts")
    val r = events(right, "b_id", "b_ts")
    val j = l.join(r, abs(col("a_ts") - col("b_ts")) <= W)
    val p = j.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"interval join must not nested-loop:\n$p")
    assert(p.contains("__graft_bucket"), "the rewrite must have fired")
    val got = j.select("a_id", "b_id").collect()
      .map(r0 => (r0.getLong(0), r0.getLong(1))).toSet
    assert(got === brute)
  }

  test("the SQL spelling rewrites too, and output carries no bucket columns") {
    events(left, "a_id", "a_ts").createOrReplaceTempView("ivl_a")
    events(right, "b_id", "b_ts").createOrReplaceTempView("ivl_b")
    val j = spark.sql(
      s"SELECT a_id, b_id FROM ivl_a JOIN ivl_b ON abs(a_ts - b_ts) <= $W")
    assert(!j.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    assert(j.columns.toSeq === Seq("a_id", "b_id"))
    val got = j.collect().map(r0 => (r0.getLong(0), r0.getLong(1))).toSet
    assert(got === brute)
  }

  test("null timestamps drop on both sides, exactly like the naive plan") {
    import spark.implicits._
    val l = Seq((1L, Some(0L)), (2L, None)).toDF("a_id", "a_ts")
    val r = Seq((101L, Some(3L)), (102L, None)).toDF("b_id", "b_ts")
    val got = l.join(r, abs(col("a_ts") - col("b_ts")) <= W)
      .select("a_id", "b_id").collect()
      .map(r0 => (r0.getLong(0), r0.getLong(1))).toSet
    assert(got === Set((1L, 101L)))
  }

  test("guard: a join that already has a cross-side equality is left alone") {
    import spark.implicits._
    val l = Seq((1L, 5L, "k1"), (2L, 50L, "k2")).toDF("a_id", "a_ts", "a_k")
    val r = Seq((101L, 7L, "k1"), (102L, 52L, "k2")).toDF("b_id", "b_ts", "b_k")
    val j = l.join(r, col("a_k") === col("b_k") &&
      abs(col("a_ts") - col("b_ts")) <= W)
    val p = j.queryExecution.executedPlan.toString
    assert(!p.contains("__graft_bucket"),
      "must not fan out when an equi key already exists")
    assert(j.count() === 2)
  }

  test("guard: outer interval joins are untouched (semantics would change under fan-out)") {
    val l = events(left, "a_id", "a_ts")
    val r = events(right, "b_id", "b_ts")
    val j = l.join(r, abs(col("a_ts") - col("b_ts")) <= W, "left_outer")
    val p = j.queryExecution.executedPlan.toString
    assert(!p.contains("__graft_bucket"), "outer joins must not rewrite")
    // and the outer result is still correct (6 left rows minimum)
    assert(j.select("a_id").distinct().count() === left.size)
  }
}
