package graft.queries

import graft.SparkTestBase

/** Physical-plan contracts for the 100 TB design claims: these assert the
  * SHAPE of the plan, not its output — a correctness-preserving regression
  * to an all-pairs join or a lost pushdown should fail CI, not a profiler
  * session six months later. Plans are built against sf0.001 (plan shape is
  * scale-invariant; AQE may re-plan sizes at runtime but the static plan
  * must already be the right one).
  */
class PlanSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("dedup family never plans an all-pairs join") {
    // d4 (simhash pairs) and d6 (embedding near-dup) were quadratic in
    // round 1; pigeonhole banding / LSH bucketing must keep them equi-joins
    Seq("d1_exact_dedup", "d2_minhash_lsh", "d3_simhash",
      "d4_simhash_pairs", "d5_ngram_jaccard", "d6_embedding_near_dup")
      .foreach { q =>
        val p = plan(q)
        assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
        assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested-loop join")
      }
  }

  test("LSH ANN (n2) is an equi-join; only the brute-force baseline (n1) may nested-loop") {
    val p = plan("n2_lsh_bucket_topk")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin")) // tiny query side broadcast on bucket
  }

  test("relational joins broadcast the dimension side") {
    // q5: region/nation/supplier dims against orders/lineitem facts
    assert(plan("q5_local_supplier_volume").contains("BroadcastHashJoin"))
  }

  test("filters reach the parquet scan (pushdown)") {
    val p = plan("q6_revenue_forecast")
    assert(p.contains("PushedFilters: [IsNotNull"), "q6 lost its scan pushdown")
  }

  test("top-k compiles to TakeOrderedAndProject, not global sort") {
    assert(plan("q3_shipping_priority").contains("TakeOrderedAndProject"))
  }

  test("fingerprinting (t4) is a pure projection — no exchange at all") {
    val p = plan("t4_fingerprint")
    // one AQE sort for the ORDER BY is fine; the fingerprint itself must not
    // shuffle per-shingle rows (no Generate/explode feeding an aggregate)
    assert(!p.contains("HashAggregate"), "t4 regressed to explode+groupBy")
  }
}
