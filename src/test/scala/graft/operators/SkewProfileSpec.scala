package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Contracts for the generic skew-profile operator (pr2's engine): exact
  * distribution arithmetic on a hand-built frame, the one-scan/heap/
  * no-window plan at ≥ 3 candidate keys (the shape pr2's inline original
  * only ever exercised at 2), guard rails, and pr2 delegation equality.
  */
class SkewProfileSpec extends SparkTestBase {

  private lazy val sf = testData("0.01")

  test("exact shares on a hand-built distribution; nulls excluded") {
    import spark.implicits._
    // key a: 6 rows over values x,x,x,y,y,z → max 3, keys 3, top1 0.5
    // key b: one null (excluded) + 5 rows all 'h' → max 5, keys 1
    val df = Seq(
      ("x", Some("h")), ("x", Some("h")), ("x", Some("h")),
      ("y", Some("h")), ("y", Some("h")), ("z", None))
      .toDF("a", "b")
    val r = SkewProfile.report(df, Seq("a", "b"), topN = 2)
      .collect().map(x => x.getString(0) -> x).toMap
    val a = r("a")
    assert(a.getLong(1) === 6L && a.getLong(2) === 3L && a.getLong(3) === 3L)
    assert(a.getDouble(4) === 0.5) // top1 = 3/6
    assert(a.getDouble(5) === math.round(5.0 / 6 * 1e6) / 1e6) // top2 = (3+2)/6
    assert(a.getDouble(6) === 1.5) // 3 / (6/3)
    val b = r("b")
    assert(b.getLong(1) === 5L && b.getLong(2) === 1L, "null b row excluded")
    assert(b.getDouble(4) === 1.0 && b.getDouble(6) === 1.0)
    // topN names the share column so reports declare their own width
    assert(SkewProfile.report(df, Seq("a"), topN = 2).columns.contains("top2_share"))
  }

  test("three candidate keys profile off ONE scan; heap aggregate, no window") {
    val r = SkewProfile.report(
      graft.core.Tables(spark, sf).events,
      Seq("user_id", "event_type", "event_id"))
    val plan = r.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans === 1, s"all candidate keys must profile off ONE scan, saw $scans")
    assert(plan.contains("graft_topk"), "top-N must run the native heap aggregate")
    assert(!plan.contains("Window"), "no |keys|-sort window in the skew pass")
    // and the report actually ranks the three keys' concentration
    assert(r.count() === 3L)
  }

  test("guard rails: empty/duplicate/missing/backtick keys, bad topN") {
    val df = graft.core.Tables(spark, sf).events
    intercept[IllegalArgumentException](SkewProfile.report(df, Nil))
    intercept[IllegalArgumentException](
      SkewProfile.report(df, Seq("user_id", "user_id")))
    intercept[IllegalArgumentException](SkewProfile.report(df, Seq("nope")))
    intercept[IllegalArgumentException](SkewProfile.report(df, Seq("user`id")))
    intercept[IllegalArgumentException](
      SkewProfile.report(df, Seq("user_id"), topN = 0))
  }

  test("pr2 is this operator bound to events' keys (delegation equality)") {
    val want = SkewProfile.report(
      graft.core.Tables(spark, sf).events, Seq("user_id", "event_type"))
      .collect().map(_.toSeq).toSeq
    val got = graft.queries.Profiling.skewProfile(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(got === want)
  }

  test("key names with a quote or backslash profile safely (literal escaping)") {
    import spark.implicits._
    val df = Seq(("v1", 1), ("v1", 2)).toDF("o'key", "n")
    val r = SkewProfile.report(df, Seq("o'key")).collect()
    assert(r.length === 1 && r.head.getString(0) === "o'key")
    assert(r.head.getLong(1) === 2L && r.head.getLong(2) === 1L)
    // the parser escape-processes string literals: an unescaped \b would
    // mangle the key_col value, a trailing \ would swallow the quote
    Seq("a\\b", "trail\\").foreach { name =>
      val d2 = Seq(("x", 1)).toDF(name, "n")
      val r2 = SkewProfile.report(d2, Seq(name)).collect()
      assert(r2.length === 1 && r2.head.getString(0) === name,
        s"key_col must round-trip '$name' exactly")
    }
  }

  test("keys resolve case-insensitively to the frame's spelling") {
    import spark.implicits._
    val df = Seq(("x", 1), ("y", 2), ("y", 3)).toDF("user_id", "n")
    // Spark's default resolver would accept USER_ID — so does the report,
    // and key_col carries the frame's own spelling
    val r = SkewProfile.report(df, Seq("USER_ID")).collect()
    assert(r.length === 1 && r.head.getString(0) === "user_id")
    assert(r.head.getLong(1) === 3L && r.head.getLong(2) === 2L)
    // two spellings of one column are a duplicate key, not two keys
    intercept[IllegalArgumentException](
      SkewProfile.report(df, Seq("user_id", "USER_ID")))
    // a key several case-variant columns answer fails loud with the
    // operator's message, not as an AMBIGUOUS_REFERENCE thrown later
    // from analysis of the generated SQL (Spark's default resolver
    // could not pick one either)
    val both = Seq((1, 2)).toDF("amb_key", "AMB_KEY")
    intercept[IllegalArgumentException](
      SkewProfile.report(both, Seq("amb_key")))
  }
}
