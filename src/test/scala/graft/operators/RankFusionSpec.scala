package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the RRF operator's exact fixed-point arithmetic and its list
  * semantics on caller-shaped frames (the n9 fixture binding stays pinned
  * by DuckDB): the fused score must be the INTEGER Σ 1e9 DIV (c + rank) —
  * reproducible by hand — a doc present in one list only gets one term,
  * and ties break by doc_id.
  */
class RankFusionSpec extends SparkTestBase {

  private def lists = {
    import spark.implicits._
    // query 1: doc 100 is rank 1 lexically and rank 2 densely; doc 200
    // appears ONLY lexically (rank 2); doc 300 only densely (rank 1).
    val lex = Seq((1L, 100L, 1L), (1L, 200L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val den = Seq((1L, 300L, 1L), (1L, 100L, 2L))
      .toDF("query_id", "doc_id", "rank")
    (lex, den)
  }

  test("rrf: exact integer fixed-point sums, single-list docs get one term") {
    val (lex, den) = lists
    val got = RankFusion.rrf(Seq(lex, den), c = 60, topK = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val s = RankFusion.Scale
    val both = s / 61 + s / 62 // doc 100: lex rank 1 + dense rank 2
    val only1 = s / 61         // doc 300: dense rank 1 only
    val only2 = s / 62         // doc 200: lex rank 2 only
    assert(got.toSeq === Seq(
      (1L, 1L, 100L, both), (1L, 2L, 300L, only1), (1L, 3L, 200L, only2)))
  }

  test("rrf: exact ties break by doc_id; topK truncates after ranking") {
    import spark.implicits._
    // two docs with identical list memberships at identical ranks — the
    // fixed-point sums are EQUAL by construction, so only doc_id can order
    val a = Seq((1L, 9L, 1L), (1L, 4L, 2L)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 4L, 1L), (1L, 9L, 2L)).toDF("query_id", "doc_id", "rank")
    val got = RankFusion.rrf(Seq(a, b), c = 60, topK = 1).collect()
      .map(r => (r.getLong(2), r.getLong(1)))
    assert(got.toSeq === Seq((4L, 1L)), "equal scores must order by doc_id")
  }

  test("rrf: more lists accumulate terms (operator is n-ary, not pairwise)") {
    val (lex, den) = lists
    val third = lex.withColumn("rank", col("rank") + 1L)
    val s = RankFusion.Scale
    val got = RankFusion.rrf(Seq(lex, den, third), c = 60, topK = 10)
      .filter(col("doc_id") === 100L).collect()
    assert(got.head.getAs[Long]("rrf_e9") === s / 61 + s / 62 + s / 62)
  }
}
