package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.TemporalJoins

/** Contracts for the dedicated as-of physical operator: it must plan as
  * AsOfJoinExec (never fall through to a nested-loop), agree with the
  * union+window formulation on every edge the two could diverge on (ties,
  * strictness, nulls, multi-batch keys), and expose the same SQL surface
  * through `graft_asof`. The fixture-scale value agreement with DuckDB's
  * native ASOF JOIN is the j3 oracle's job; these pin the semantics the
  * oracle can't isolate.
  */
class AsOfJoinExecSpec extends SparkTestBase {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // (key, ts-seconds, id) build rows / (key, ts-seconds, pid) probe rows
  private def frames(
      probe: Seq[(java.lang.Long, java.lang.Long, Long)],
      build: Seq[(java.lang.Long, java.lang.Long, Long)]): (DataFrame, DataFrame) = {
    import spark.implicits._
    val p = probe.map { case (k, t, id) =>
      (k, Option(t).map(x => ts(x.longValue)).orNull, id)
    }.toDF("user_id", "ts", "purchase_id")
    val b = build.map { case (k, t, id) =>
      (k, Option(t).map(x => ts(x.longValue)).orNull, id)
    }.toDF("user_id", "ts", "trig_id")
    (p, b)
  }

  private def run(p: DataFrame, b: DataFrame, strict: Boolean = true,
      outer: Boolean = false): Seq[(Long, Long, Any)] =
    TemporalJoins.asOfExec(p, b, Seq("user_id"), "ts",
        carry = Seq("trig_id"), strict = strict, tieBreak = Seq("trig_id"),
        keepUnmatched = outer)
      .select("user_id", "purchase_id", "asof_trig_id")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.get(2)))
      .sortBy(t => (t._1, t._2))

  test("plans as AsOfJoinExec — no window, no sort-merge, no nested loop") {
    val df = graft.SparkEntry.queries("j3_asof_exec")(spark, testData("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin ["), plan) // nodeName strips the Exec suffix
    assert(!plan.contains("SortMergeJoin"), "fell through to a standard join")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    assert(!plan.contains("Window"), "exec path must not pay the window formulation")
  }

  test("agrees with the union+window formulation on the events fixture") {
    val ev = graft.core.Tables(spark, testData("0.001")).events
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val triggers = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("ts"), col("event_id").as("trig_id"),
        col("event_type").as("trig_type"))
    def norm(df: DataFrame) = df
      .select("purchase_id", "asof_trig_id", "asof_trig_type")
      .collect().map(_.toSeq).sortBy(_.toString)
    val window = TemporalJoins.asOf(purchases, triggers, Seq("user_id"), "ts",
      carry = Seq("trig_id", "trig_type"), strict = true, tieBreak = Seq("trig_id"))
    val exec = TemporalJoins.asOfExec(purchases, triggers, Seq("user_id"), "ts",
      carry = Seq("trig_id", "trig_type"), strict = true, tieBreak = Seq("trig_id"))
    assert(norm(exec).toSeq == norm(window).toSeq)
  }

  test("build-side ts ties resolve to the largest tieBreak, matching the window form") {
    val (p, b) = frames(
      probe = Seq((1L: java.lang.Long, 100L: java.lang.Long, 10L)),
      build = Seq((1L: java.lang.Long, 50L: java.lang.Long, 7L),
        (1L: java.lang.Long, 50L: java.lang.Long, 9L),
        (1L: java.lang.Long, 50L: java.lang.Long, 8L)))
    assert(run(p, b) == Seq((1L, 10L, 9L)))
  }

  test("strict drops the equal-ts trigger; non-strict takes it") {
    val (p, b) = frames(
      probe = Seq((1L: java.lang.Long, 100L: java.lang.Long, 10L)),
      build = Seq((1L: java.lang.Long, 100L: java.lang.Long, 5L),
        (1L: java.lang.Long, 90L: java.lang.Long, 4L)))
    assert(run(p, b, strict = true) == Seq((1L, 10L, 4L)))
    assert(run(p, b, strict = false) == Seq((1L, 10L, 5L)))
  }

  test("inner drops unmatched probes; left outer null-extends them") {
    val (p, b) = frames(
      probe = Seq((1L: java.lang.Long, 10L: java.lang.Long, 10L),
        (2L: java.lang.Long, 10L: java.lang.Long, 20L)),
      build = Seq((1L: java.lang.Long, 5L: java.lang.Long, 1L)))
    assert(run(p, b) == Seq((1L, 10L, 1L)))
    assert(run(p, b, outer = true) == Seq((1L, 10L, 1L), (2L, 20L, null)))
  }

  test("null ts rows never match: null-ts builds are invisible, null-ts probes unmatched") {
    val (p, b) = frames(
      probe = Seq((1L: java.lang.Long, 100L: java.lang.Long, 10L),
        (1L: java.lang.Long, null, 11L)),
      build = Seq((1L: java.lang.Long, null, 99L),
        (1L: java.lang.Long, 50L: java.lang.Long, 1L)))
    assert(run(p, b) == Seq((1L, 10L, 1L)))
    assert(run(p, b, outer = true) == Seq((1L, 10L, 1L), (1L, 11L, null)))
  }

  test("randomized cross-check against the window formulation (keys, ties, sparse builds)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    val probe = (1 to 400).map { i =>
      (rnd.nextInt(20).toLong, ts(rnd.nextInt(1000).toLong), 100000L + i)
    }.toDF("user_id", "ts", "purchase_id")
    val build = (1 to 300).map { i =>
      (rnd.nextInt(25).toLong, ts(rnd.nextInt(1000).toLong), 200000L + i)
    }.toDF("user_id", "ts", "trig_id")
    def norm(df: DataFrame) = df.select("purchase_id", "asof_trig_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val w = TemporalJoins.asOf(probe, build, Seq("user_id"), "ts",
      carry = Seq("trig_id"), strict = true, tieBreak = Seq("trig_id"))
    val e = TemporalJoins.asOfExec(probe, build, Seq("user_id"), "ts",
      carry = Seq("trig_id"), strict = true, tieBreak = Seq("trig_id"))
    val (we, ee) = (norm(w), norm(e))
    assert(ee.nonEmpty && ee == we)
  }

  test("the SQL spelling graft_asof(p.ts, b.ts, tieBreak) plans the same exec") {
    val (p, b) = frames(
      probe = Seq((1L: java.lang.Long, 100L: java.lang.Long, 10L)),
      build = Seq((1L: java.lang.Long, 50L: java.lang.Long, 7L),
        (1L: java.lang.Long, 50L: java.lang.Long, 9L)))
    p.createOrReplaceTempView("asof_probe")
    b.createOrReplaceTempView("asof_build")
    val df = spark.sql(
      """SELECT p.user_id, p.purchase_id, b.trig_id
        |FROM asof_probe p JOIN asof_build b
        |  ON p.user_id = b.user_id AND graft_asof(p.ts, b.ts, b.trig_id)
        |""".stripMargin)
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin ["))
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq((1L, 10L, 9L)))
  }
}
