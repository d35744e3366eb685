package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Profiling operators: structural invariants of the reports and the plan
  * shapes their scale claims rest on (pr1 single scan, pr2 heap-aggregate
  * top-10 with no window sort).
  */
class ProfilingSpec extends SparkTestBase {

  private lazy val sf = testData("0.001")

  test("pr1 column profile: one scan, ratios in range, distincts bounded") {
    // no .cache(): the cache manager would substitute plan-equal subtrees
    // in the SAME suite's later plan assertion with InMemoryTableScans
    val prof = Profiling.columnProfile(spark, sf)
    // plan string read BEFORE execution: AQE's post-run adaptive plan
    // prints materialized query stages with their subtrees repeated, so
    // a post-collect scan count would double-count the single real scan
    val plan = prof.queryExecution.executedPlan.toString
    val rows = prof.collect().map(r => r.getString(0) -> r).toMap
      assert(rows.keySet === Set("doc_id", "text", "lang", "source", "n_chars"))
      val n = rows("doc_id").getDouble(2) // doc_id is unique → n_distinct = n
      rows.values.foreach { r =>
        val nullRatio = r.getDouble(1)
        assert(nullRatio >= 0.0 && nullRatio <= 1.0)
        assert(r.getDouble(2) <= n, "n_distinct cannot exceed the row count")
      }
      // numeric stats only where promised
      assert(!rows("lang").isNullAt(2) && rows("lang").isNullAt(5))
      assert(!rows("n_chars").isNullAt(5) && !rows("n_chars").isNullAt(6))
      assert(rows("n_chars").getDouble(3) <= rows("n_chars").getDouble(4),
        "min_val <= max_val")

      val scans = "Scan parquet".r.findAllIn(plan).size
      assert(scans === 1, s"profile must read the table ONCE, saw $scans scans")
      assert(plan.contains("Expand"),
        "exact multi-column DISTINCT plans as Expand (the documented cost; " +
          "its absence means the distincts silently degraded)")
  }

  test("pr2 skew profile: shares ordered, hot key detected, heap plan") {
    val sk = Profiling.skewProfile(spark, sf)
    val plan = sk.queryExecution.executedPlan.toString
    val byKey = sk.collect().map(r => r.getString(0) -> r).toMap
      assert(byKey.keySet === Set("user_id", "event_type"))
      byKey.values.foreach { r =>
        val (top1, top10, ratio) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
        assert(top1 > 0 && top1 <= top10 && top10 <= 1.0 + 1e-9)
        assert(ratio >= 1.0 - 1e-9, "max/avg skew ratio is >= 1 by definition")
        assert(r.getLong(2) <= r.getLong(1), "n_keys <= n_rows")
      }
      // the fixture's event_type vocabulary is tiny and hot, user_id wide
      // and flat: the diagnostic must rank their per-key concentration
      // accordingly (this is the decision the report exists to inform)
      assert(byKey("event_type").getDouble(4) > byKey("user_id").getDouble(4),
        "event_type's hottest key must concentrate more than user_id's")

      assert(plan.contains("graft_topk"), "top-10 must run the native heap aggregate")
      assert(!plan.contains("Window"), "no |keys|-sort window in the skew pass")
      val scans = "Scan parquet".r.findAllIn(plan).size
      assert(scans === 1,
        s"all candidate keys must profile off ONE scan, saw $scans")
  }
}
