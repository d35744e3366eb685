package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

import graft.SparkTestBase

/** Contract of the incremental rollup fold (e5's operator): delta-at-a-time
  * folding equals the one-shot aggregate, untouched state passes through by
  * anti-join (never re-aggregated), and the state side of the fold plans as
  * broadcast-pruned joins — the state is scanned, not shuffled.
  */
class RollupsSpec extends SparkTestBase {
  import spark.implicits._

  private def facts(rows: Seq[(Long, String, Double)]) =
    rows.toDF("k", "event_type", "value")
      .select(col("k"), col("event_type"), col("value"))

  private val keys = Seq("k", "event_type")
  private def empty = Rollups.emptyRollup(spark,
    Seq("k" -> LongType, "event_type" -> StringType))

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select(col("k"), col("event_type"), col("n_events"),
        round(col("total_value"), 6).as("v"))
      .collect().map(_.toSeq).sortBy(_.toString)

  test("three folds equal the one-shot aggregate") {
    val all = (1L to 300L).map(i => (i % 7, s"t${i % 3}", i * 0.31))
    val chunks = all.grouped(100).toSeq
    var state = empty
    chunks.foreach { c =>
      state = Rollups.fold(facts(c), state, keys).localCheckpoint()
    }
    val oneShot = facts(all).groupBy("k", "event_type")
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
    assert(canon(state) === canon(oneShot))
  }

  test("untouched keys pass through unchanged; touched keys accumulate") {
    val s1 = Rollups.fold(facts(Seq((1L, "a", 1.0), (2L, "a", 2.0))), empty, keys)
      .localCheckpoint()
    val s2 = Rollups.fold(facts(Seq((2L, "a", 5.0), (3L, "b", 7.0))), s1, keys)
    val m = s2.collect().map(r => (r.getLong(0), r.getString(1)) ->
      (r.getLong(2), r.getDouble(3))).toMap
    assert(m((1L, "a")) === ((1L, 1.0)))   // untouched
    assert(m((2L, "a")) === ((2L, 7.0)))   // accumulated
    assert(m((3L, "b")) === ((1L, 7.0)))   // new key
  }

  test("the state is broadcast-pruned, never shuffled") {
    val s1 = Rollups.fold(facts(Seq((1L, "a", 1.0))), empty, keys).localCheckpoint()
    val plan = Rollups.fold(facts(Seq((2L, "a", 2.0))), s1, keys)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join state passthrough:\n$plan")
  }

  test("NULL keys merge as one group across folds, like GROUP BY treats them") {
    // plain equi pruning never matched a NULL-key state row: it slipped
    // the semi-join AND survived the anti-join, so each fold APPENDED a
    // fresh NULL-key row beside the old one — the one-shot oracle (one
    // NULL group) disagreed and dashboards double-counted
    val nullType = Seq((1L, Option.empty[String], 1.0), (1L, Option.empty[String], 2.0))
      .toDF("k", "event_type", "value")
    val s1 = Rollups.fold(nullType, empty, keys).localCheckpoint()
    val more = Seq((1L, Option.empty[String], 5.0))
      .toDF("k", "event_type", "value")
    val s2 = Rollups.fold(more, s1, keys)
    val rows = s2.filter(col("event_type").isNull).collect()
    assert(rows.length === 1, s"NULL-key group split into ${rows.length} rows")
    assert(rows(0).getAs[Long]("n_events") === 3L)
    assert(rows(0).getAs[Double]("total_value") === 8.0)
  }
}
