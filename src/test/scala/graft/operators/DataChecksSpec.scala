package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.DataChecks._

/** The generic constraint-validation operator: violation counting under
  * SQL null semantics, uniqueness as duplicate-excess, threshold
  * boundaries, name/threshold contracts, and the one-scan plan.
  */
class DataChecksSpec extends SparkTestBase {

  import spark.implicits._

  private def frame = Seq(
    (Some(1L), Some("a")),
    (Some(2L), Some("a")), // duplicate value in col b
    (Some(2L), None),      // duplicate id + null b
    (None, Some("c"))      // null id
  ).toDF("id", "b")

  test("row checks: an UNKNOWN predicate is a violation") {
    val out = report(frame, Seq(
      RowCheck("id_not_null", "id IS NOT NULL"),
      // null b makes `b = 'a'` UNKNOWN → violation, not a pass
      RowCheck("b_is_a", "b = 'a'", threshold = 0.5)))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("id_not_null").getLong(1) === 3L) // satisfied
    assert(out("id_not_null").getBoolean(4) === false) // 3/4 < 1.0
    assert(out("b_is_a").getLong(1) === 2L)
    assert(out("b_is_a").getBoolean(4) === true) // 2/4 >= 0.5 exactly
  }

  test("unique check: each extra copy is ONE violation; nulls are not") {
    val out = report(frame, Seq(UniqueCheck("unique_id", "id")))
      .collect().head
    // ids: 1, 2, 2, null → non-null 3, distinct 2 → excess 1 → satisfied 3/4
    assert(out.getLong(1) === 3L)
    assert(out.getLong(2) === 4L)
    assert(out.getBoolean(4) === false)
  }

  test("threshold boundary: a rate exactly AT the threshold passes") {
    val out = report(frame, Seq(
      RowCheck("exactly_three_quarters", "id IS NOT NULL", threshold = 0.75)))
      .collect().head
    assert(out.getDouble(3) === 0.75)
    assert(out.getBoolean(4) === true)
  }

  test("fk check: orphans counted, null child keys are not orphans, parent dups don't multiply") {
    val parent = Seq(10L, 20L, 20L).toDF("pk") // duplicate parent keys
    val child = Seq(Some(10L), Some(20L), Some(99L), None).toDF("fk")
    val out = report(child, Seq(
      FkCheck("fk_ok_rate", "fk", parent, "pk", threshold = 0.75)))
      .collect().head
    // 99 is the only orphan (null fk passes, SQL MATCH SIMPLE); the
    // duplicated parent key must not multiply child rows: total stays 4
    assert(out.getLong(1) === 3L)
    assert(out.getLong(2) === 4L)
    assert(out.getDouble(3) === 0.75)
    assert(out.getBoolean(4) === true)
    val failing = report(child, Seq(
      FkCheck("fk_strict", "fk", parent, "pk"))).collect().head
    assert(failing.getBoolean(4) === false, "an orphan must fail a 1.0 gate")
  }

  test("mixed report: scan checks and fk checks union into one ordered table") {
    val parent = Seq(1L).toDF("pk")
    val out = report(frame, Seq(
      RowCheck("a_not_null", "id IS NOT NULL", threshold = 0.5),
      UniqueCheck("b_unique", "id", threshold = 0.5),
      FkCheck("c_fk", "id", parent, "pk", threshold = 0.25)))
    val names = out.collect().map(_.getString(0)).toSeq
    assert(names === names.sorted && names.size === 3)
    assert(out.columns.toSeq ===
      Seq("check_name", "satisfied", "total", "rate", "passed"))
  }

  test("one violation in 2M rows fails a strict 1.0 gate (no rounding escape)") {
    // the display rate rounds to 1.000000 here — the verdict must compare
    // exact integers, or a 5e-7 violation fraction silently passes
    val big = spark.range(2000000L).toDF("id")
    val out = report(big, Seq(RowCheck("all_positive", "id > 0"))).collect().head
    assert(out.getLong(1) === 1999999L)
    assert(out.getDouble(3) === 1.0, "display rate DOES round to 1.0 — that's the trap")
    assert(out.getBoolean(4) === false, "the verdict must not take the rounding escape")
  }

  test("an empty frame fails every check — a gate with nothing to verify must not promote") {
    val empty = spark.range(0).toDF("id").filter("id > 0")
    val out = report(empty, Seq(
      RowCheck("r", "id IS NOT NULL", threshold = 0.0),
      UniqueCheck("u", "id"))).collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getLong(2) === 0L)
      assert(!r.isNullAt(4) && r.getBoolean(4) === false,
        "passed must be a definite false on an empty frame, never NULL")
    }
  }

  test("contracts fail loudly: bad names, bad thresholds, empty sets") {
    intercept[IllegalArgumentException] { report(frame, Nil) }
    intercept[IllegalArgumentException] {
      report(frame, Seq(RowCheck("bad name", "id IS NOT NULL")))
    }
    intercept[IllegalArgumentException] {
      report(frame, Seq(RowCheck("t", "id IS NOT NULL", threshold = 1.5)))
    }
    intercept[IllegalArgumentException] {
      report(frame, Seq(
        RowCheck("dup", "id IS NOT NULL"), UniqueCheck("dup", "id")))
    }
  }

  test("pr3's bound report runs off one scan and carries a failing gate row") {
    val rep = graft.queries.Profiling
      .constraintReport(spark, testData("0.001"))
    val plan = rep.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans === 1, s"all checks must fold into ONE scan, saw $scans")
    val rows = rep.collect().map(r => r.getString(0) -> r.getBoolean(4)).toMap
    assert(rows("english_majority") === false,
      "the deliberately failing policy gate must REPORT its failure")
    assert(rows.count(_._2 == false) === 1, "exactly one failing row expected")
  }
}
