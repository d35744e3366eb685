package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** graft_topk's contract: exact agreement with the sort-based spelling
  * under random data, the deterministic tie rule, null handling, survival
  * of partial/merge across many input partitions, and the plan shape the
  * aggregate exists for — HashAggregate partial+final with NO sort
  * operator anywhere (the window form sorts twice).
  */
class TopKAggSpec extends SparkTestBase {
  import spark.implicits._

  private def topkDf(rows: Seq[(Long, Double, Long)], parts: Int) =
    rows.toDF("g", "score", "id").repartition(parts)
      .groupBy("g").agg(expr("graft_topk(3, score, id)").as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).cast("long").as("rank"),
        col("col.score").as("score"), col("col.id").as("id"))

  test("agrees with the sorted spelling on random data across partitions") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 2000L).map(i =>
      (i % 17, math.floor(rnd.nextDouble() * 100) / 10, i))
    val got = topkDf(rows, 13).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.sortBy { case (_, s, i) => (-s, i) }.take(3).zipWithIndex.map {
        case ((_, s, i), r) => (g, r + 1L, s, i)
      }
    }.toSet
    assert(got === want)
  }

  test("ties break to the smaller id; nulls never enter the heap") {
    val df = Seq[(Long, java.lang.Double, java.lang.Long)](
      (1L, 5.0, 30L), (1L, 5.0, 10L), (1L, 5.0, 20L), (1L, 5.0, 40L),
      (1L, null, 1L), (1L, 9.0, null)
    ).toDF("g", "score", "id")
      .groupBy("g").agg(expr("graft_topk(3, score, id)").as("top"))
    val top = df.select(explode(col("top"))).collect()
      .map(r => (r.getStruct(0).getDouble(0), r.getStruct(0).getLong(1)))
    assert(top.toSeq === Seq((5.0, 10L), (5.0, 20L), (5.0, 30L)))
  }

  test("groups smaller than k return all rows in rank order") {
    val top = Seq((1L, 2.0, 7L), (1L, 8.0, 3L)).toDF("g", "score", "id")
      .groupBy("g").agg(expr("graft_topk(5, score, id)").as("top"))
      .select(explode(col("top"))).collect()
      .map(r => (r.getStruct(0).getDouble(0), r.getStruct(0).getLong(1)))
    assert(top.toSeq === Seq((8.0, 3L), (2.0, 7L)))
  }

  test("plans as a two-phase hash aggregate with no sort") {
    val plan = Seq((1L, 1.0, 1L)).toDF("g", "score", "id")
      .groupBy("g").agg(expr("graft_topk(3, score, id)").as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_topk"),
      s"expected a map-side partial aggregate:\n$plan")
    assert(!plan.contains("Sort "), s"expected no sort operator:\n$plan")
  }

  test("malformed calls fail at analysis") {
    val e = intercept[Exception] {
      Seq((1L, 1.0)).toDF("g", "s")
        .groupBy("g").agg(expr("graft_topk(s, s, s)")).collect()
    }
    assert(e.getMessage.contains("literal") || e.getMessage.contains("foldable")
      || e.getMessage.toLowerCase.contains("graft_topk"))
    // a NULL literal k used to NPE instead of naming the contract
    val e2 = intercept[Exception] {
      Seq((1L, 1.0, 2L)).toDF("g", "s", "i")
        .groupBy("g").agg(expr("graft_topk(NULL, s, i)")).collect()
    }
    assert(e2.getMessage.toLowerCase.contains("graft_topk"))
  }

  test("NaN scores rank greatest (Spark's total double order) and never wedge the heap") {
    // primitive < is not total under NaN: a NaN at the heap root compared
    // false against everything, so it could never be displaced — [NaN, 5]
    // survived while a strictly better 9 was rejected
    val rows = Seq((1L, Double.NaN, 1L), (1L, 5.0, 2L), (1L, 9.0, 3L),
      (1L, 7.0, 4L))
    val got = rows.toDF("g", "s", "i")
      .groupBy("g").agg(expr("graft_topk(2, s, i)").as("top"))
      .selectExpr("transform(top, t -> t.id) AS ids").collect()(0)
      .getAs[scala.collection.Seq[Long]](0)
    // NaN is greatest in Spark's sort order (above +Inf), so it ranks
    // first, then 9.0 — exactly what ORDER BY s DESC would keep
    assert(got.toSeq === Seq(1L, 3L), s"wrong ids: $got")
  }

  test("±0.0 ties break by id, consistently between heap and final order") {
    val rows = Seq((1L, 0.0, 2L), (1L, -0.0, 1L))
    val got = rows.toDF("g", "s", "i")
      .groupBy("g").agg(expr("graft_topk(2, s, i)").as("top"))
      .selectExpr("transform(top, t -> t.id) AS ids").collect()(0)
      .getAs[scala.collection.Seq[Long]](0)
    // Double.compare puts 0.0 above -0.0 — one total order everywhere
    // (the old sortBy(-s) negation flipped them against the heap's rule)
    assert(got.toSeq === Seq(2L, 1L), s"wrong ids: $got")
  }
}
