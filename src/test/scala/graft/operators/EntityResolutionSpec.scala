package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Generic-tier contracts for EntityResolution.fuzzyMatches on
  * caller-shaped frames (not the fixture): canonicalization, the block-size
  * guard, the banded threshold, and the no-all-pairs plan shape.
  */
class EntityResolutionSpec extends SparkTestBase {

  import EntityResolution.fuzzyMatches

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "name")
  }

  private val byLastToken: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    v => element_at(split(v, " "), -1)

  test("distinct values pair within blocks; canonical id is min, support counts ride along") {
    val d = df((5L, "cold anvil"), (3L, "cold anvil"), (9L, "old anvil"),
      (1L, "red widget"), (2L, "blue widget"))
    val got = fuzzyMatches(d, "id", "name", byLastToken, maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq.sorted
    // "red widget" vs "blue widget" is distance 3 — outside the band
    assert(got == Seq(("cold anvil", "old anvil", 1, 3L, 9L, 2L, 1L)))
  }

  test("pairs never cross blocks even when closer than the threshold") {
    val d = df((1L, "old anvil"), (2L, "old anvil x"))
    assert(fuzzyMatches(d, "id", "name", byLastToken, 3).count() == 0)
  }

  test("oversized blocks are dropped whole (non-discriminative key guard)") {
    val big = (1L to 10L).map(i => (i, s"name$i common"))
    val small = Seq((100L, "cold rare"), (101L, "old rare"))
    val d = df((big ++ small): _*)
    val got = fuzzyMatches(d, "id", "name", byLastToken, 2, maxBlockSize = 5)
      .select("value_a", "value_b").collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("cold rare", "old rare")))
    // raising the cap readmits the big block's within-band pairs
    assert(fuzzyMatches(d, "id", "name", byLastToken, 2, maxBlockSize = 50)
      .count() > 1)
  }

  test("plan: block-count guard broadcasts; candidate join is an equi-join, never a cartesian") {
    val d = df((1L, "cold anvil"), (2L, "old anvil"))
    val plan = fuzzyMatches(d, "id", "name", byLastToken, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("BroadcastHashJoin"), "the tiny block-count frame must broadcast")
  }
}
