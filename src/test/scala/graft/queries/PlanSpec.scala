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

  test("IVF ANN (n4): candidate joins are hash joins; nested-loop only against the 8-row centroid table") {
    val p = plan("n4_ivf_topk")
    assert(!p.contains("CartesianProduct"))
    // the assignment/probe cross joins hit the constant-size broadcast
    // centroid table — legal at any corpus size; the corpus-side candidate
    // join must be a hash join on (cell)/(vec_id)/(query_id)
    assert(p.contains("BroadcastHashJoin"), "candidate join lost its equi-join shape")
    val e = Similarity.ivfTopK(spark, sf).collect()
    // IVF output agrees with the brute-force baseline where cells allow:
    // every reported neighbor must appear with the SAME cosine in n1's full
    // ranking universe (consistency, not recall — recall is tunable via K/nprobe)
    val brute = Similarity.bruteForceTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("cos"))
      .toMap
    e.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      brute.get(key).foreach(c => assert(c === r.getAs[Double]("cos"),
        s"cosine mismatch vs brute force for $key"))
    }
    assert(e.nonEmpty)
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
