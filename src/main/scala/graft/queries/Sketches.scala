package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Skew

/** Sketch-based aggregation surface (SURVEY §7.1 step 8's
  * `approx_count_distinct`-class): HLL cardinalities next to their exact
  * counts. The two engines run DIFFERENT sketch implementations, so the
  * oracle-comparable output is the exact count plus a within-tolerance
  * boolean — each engine's estimate must land within 10% of truth (HLL at
  * these cardinalities is well inside that; the check is deterministic for
  * a fixed dataset, not flaky).
  */
object Sketches {

  private val Tolerance = 0.10

  def sketchDistinct(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def one(name: String, df: DataFrame, c: String): DataFrame =
      df.agg(
        countDistinct(col(c)).as("exact_n"),
        approx_count_distinct(col(c)).as("approx_n"))
        .select(
          lit(name).as("key"),
          col("exact_n"),
          (abs(col("approx_n") - col("exact_n")).cast("double") / col("exact_n")
            <= Tolerance).as("approx_ok"))
    one("l_partkey", t.lineitem, "l_partkey")
      .unionAll(one("o_custkey", t.orders, "o_custkey"))
      .unionAll(one("user_id", t.events, "user_id"))
      .orderBy("key")
  }

  val sketchDistinctSql: String =
    s"""SELECT 'l_partkey' AS key, count(DISTINCT l_partkey) AS exact_n,
       |  abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey)) * 1.0
       |    / count(DISTINCT l_partkey) <= $Tolerance AS approx_ok
       |FROM lineitem
       |UNION ALL
       |SELECT 'o_custkey', count(DISTINCT o_custkey),
       |  abs(approx_count_distinct(o_custkey) - count(DISTINCT o_custkey)) * 1.0
       |    / count(DISTINCT o_custkey) <= $Tolerance
       |FROM orders
       |UNION ALL
       |SELECT 'user_id', count(DISTINCT user_id),
       |  abs(approx_count_distinct(user_id) - count(DISTINCT user_id)) * 1.0
       |    / count(DISTINCT user_id) <= $Tolerance
       |FROM events
       |ORDER BY key""".stripMargin

  /** Two-phase salted aggregation over the MOST skewed grouping in the
    * schema (3 return flags across the whole lineitem table): must equal
    * the plain GROUP BY — the oracle is the unsalted formulation, so the
    * salting is proven result-invariant, not just plausible.
    */
  def saltedRollup(spark: SparkSession, dir: String): DataFrame =
    Skew.saltedSum(
      Tables(spark, dir).lineitem.select("l_returnflag", "l_quantity"),
      keys = Seq("l_returnflag"), value = "l_quantity",
      saltBuckets = 32, resultName = "sum_qty")
      .select(col("l_returnflag"), round(col("sum_qty"), 2).as("sum_qty"))
      .orderBy("l_returnflag")

  val saltedRollupSql: String =
    """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Exact interpolated percentiles per group (the distribution-shape
    * counterpart of z1's cardinalities), computed rank-based: row_number +
    * count over a per-group sort, keep ONLY the two order statistics each
    * percentile interpolates between, interpolate in a tiny final select.
    * This beats the builtin `percentile` aggregate (a TypedImperativeAgg
    * merging a per-partition value→count map — measured 4.5 s vs 1.x s at
    * sf0.1) because the heavy path stays in Tungsten sort + codegen and the
    * collected state is 6 rows per group, not every distinct value.
    * At 100 TB swap in `approx_percentile` (mergeable sketch, bounded
    * memory, no global per-group sort) — same query shape.
    */
  def priceQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ps = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
    val w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    val ranked = Tables(spark, dir).lineitem
      .select(col("l_returnflag"), col("l_extendedprice"))
      .withColumn("rn", row_number().over(w) - 1)
      .withColumn("n", count(lit(1)).over(Window.partitionBy("l_returnflag")))
    // a row survives iff it is the floor- or ceil-rank of SOME percentile
    val needed = ps.map { case (_, p) =>
      val pos = (col("n") - 1) * p
      (col("rn") === floor(pos)) || (col("rn") === ceil(pos))
    }.reduce(_ || _)
    val picked = ranked.filter(needed)
    val aggs = ps.map { case (name, p) =>
      val rowPos = (col("n") - 1) * p // row-level, inside aggregate args
      val pos = (max(col("n")) - 1) * p // aggregate-level, for the fraction
      val lo = max(when(col("rn") === floor(rowPos), col("l_extendedprice")))
      val hi = max(when(col("rn") === ceil(rowPos), col("l_extendedprice")))
      round(lo + (pos - floor(pos)) * (hi - lo), 4).as(name)
    }
    picked.groupBy("l_returnflag")
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("l_returnflag")
  }

  val priceQuantilesSql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
      |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "z1_sketch_distinct" -> (sketchDistinct _),
    "z2_salted_rollup" -> (saltedRollup _),
    "z3_price_quantiles" -> (priceQuantiles _))

  val oracles: Map[String, String] = Map(
    "z1_sketch_distinct" -> sketchDistinctSql,
    "z2_salted_rollup" -> saltedRollupSql,
    "z3_price_quantiles" -> priceQuantilesSql)
}
