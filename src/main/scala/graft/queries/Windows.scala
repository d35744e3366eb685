package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Ranking/analytic window surface (SURVEY §2.8 — flagged extension: the
  * reference lake's natural analytics need these, e.g. "latest catalogue per
  * province" = row_number over a partition).
  *
  * Window partitions here are bounded by a natural key (customer, type,
  * user) whose per-key row counts stay small as data grows — no
  * whole-table single-partition windows, which would not survive 100 TB.
  * Every window order carries a unique tie-break column so results are
  * deterministic under any physical row order.
  */
object Windows {

  /** Latest order per customer — the reference's "latest catalogue per
    * province" shape (SURVEY §2.8) on the synthetic star schema.
    */
  def latestOrderPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_orderdate"), desc("o_orderkey"))
    Tables(spark, dir).orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("latest_order_date"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy("o_custkey")
  }

  val latestOrderPerCustomerSql: String =
    """SELECT o_custkey, o_orderkey,
      | strftime(o_orderdate, '%Y-%m-%d') AS latest_order_date,
      | round(o_totalprice, 2) AS o_totalprice
      |FROM (SELECT *, row_number() OVER (
      |        PARTITION BY o_custkey
      |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |      FROM orders)
      |WHERE rn = 1
      |ORDER BY o_custkey""".stripMargin

  /** Top-5 parts by retail price within each type (dense ranking family). */
  def partPriceRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("p_type").orderBy(desc("p_retailprice"), asc("p_partkey"))
    Tables(spark, dir).part
      .withColumn("price_rank", rank().over(w).cast("long"))
      .filter(col("price_rank") <= 5)
      .select(col("p_type"), col("price_rank"), col("p_partkey"), col("p_name"),
        round(col("p_retailprice"), 2).as("p_retailprice"))
      .orderBy("p_type", "price_rank", "p_partkey")
  }

  val partPriceRankSql: String =
    """SELECT p_type, price_rank, p_partkey, p_name,
      | round(p_retailprice, 2) AS p_retailprice
      |FROM (SELECT *, CAST(rank() OVER (
      |        PARTITION BY p_type
      |        ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS price_rank
      |      FROM part)
      |WHERE price_rank <= 5
      |ORDER BY p_type, price_rank, p_partkey""".stripMargin

  /** Inter-order gap stats per customer via lag(). Null order dates are
    * excluded by contract on both engines: they sort at OPPOSITE ends of
    * an ASC window (Spark NULLS FIRST, DuckDB NULLS LAST), so an
    * unfiltered null-date row pairs different lag() neighbors in each —
    * in DuckDB it even survives the prev_date filter with a NULL gap.
    */
  def customerOrderGaps(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(asc("o_orderdate"), asc("o_orderkey"))
    Tables(spark, dir).orders
      .filter(col("o_orderdate").isNotNull)
      .withColumn("prev_date", lag("o_orderdate", 1).over(w))
      .withColumn("gap_days", datediff(col("o_orderdate"), col("prev_date")).cast("long"))
      .filter(col("prev_date").isNotNull)
      .groupBy("o_custkey")
      .agg(
        count(lit(1)).as("n_gaps"),
        round(avg("gap_days"), 4).as("avg_gap_days"),
        max("gap_days").as("max_gap_days"))
      .orderBy("o_custkey")
  }

  val customerOrderGapsSql: String =
    """SELECT o_custkey, count(*) AS n_gaps,
      | round(avg(gap_days), 4) AS avg_gap_days,
      | max(gap_days) AS max_gap_days
      |FROM (SELECT o_custkey,
      |        CAST(date_diff('day', lag(o_orderdate, 1) OVER w, o_orderdate) AS BIGINT) AS gap_days,
      |        lag(o_orderdate, 1) OVER w AS prev_date
      |      FROM orders WHERE o_orderdate IS NOT NULL
      |      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
      |WHERE prev_date IS NOT NULL
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin

  /** Parts priced above their type's average — windowed aggregate compare. */
  def aboveAvgParts(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("p_type")
    Tables(spark, dir).part
      .withColumn("type_avg", avg("p_retailprice").over(w))
      .filter(col("p_retailprice") > col("type_avg"))
      .select(col("p_partkey"), col("p_type"),
        round(col("p_retailprice"), 2).as("p_retailprice"),
        round(col("type_avg"), 4).as("type_avg"))
      .orderBy("p_partkey")
  }

  val aboveAvgPartsSql: String =
    """SELECT p_partkey, p_type,
      | round(p_retailprice, 2) AS p_retailprice,
      | round(type_avg, 4) AS type_avg
      |FROM (SELECT *, avg(p_retailprice) OVER (PARTITION BY p_type) AS type_avg
      |      FROM part)
      |WHERE p_retailprice > type_avg
      |ORDER BY p_partkey""".stripMargin

  /** w5: per-customer top-3 orders by price through the NATIVE top-k
    * AGGREGATE (`graft_topk`, functions/TopKAgg.scala) — same results as
    * the row_number window spelling (the oracle), different machinery: no
    * sort anywhere, partial k-heaps combine map-side, and the exchange
    * carries at most k pairs per (customer, input partition) however hot
    * a customer is. The SQL surface is exercised deliberately — the
    * aggregate resolves through the GraftExtensions registration, the
    * cluster-wide path.
    */
  def topOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir).orders.createOrReplaceTempView("w5_orders")
    spark.sql(
      """SELECT o_custkey, CAST(p.pos + 1 AS BIGINT) AS rank,
        |  p.col.id AS o_orderkey, round(p.col.score, 2) AS o_totalprice
        |FROM (SELECT o_custkey,
        |        graft_topk(3, o_totalprice, o_orderkey) AS top
        |      FROM w5_orders GROUP BY o_custkey)
        |LATERAL VIEW posexplode(top) p
        |ORDER BY o_custkey, rank""".stripMargin)
  }

  /** The tie rule differs between the heap (score DESC, id ASC) and a
    * naive `ORDER BY o_totalprice DESC` window (id order unspecified), so
    * the oracle pins the identical total order explicitly — including the
    * NULL convention: graft_topk never admits a null score or id (SQL
    * aggregates ignore nulls), where an unfiltered window would RANK a
    * null price (DESC NULLS LAST) and emit the row.
    */
  val topOrdersPerCustomerSql: String =
    """SELECT o_custkey, rank, o_orderkey, round(o_totalprice, 2) AS o_totalprice
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |        CAST(row_number() OVER (PARTITION BY o_custkey
      |          ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank
      |      FROM orders
      |      WHERE o_totalprice IS NOT NULL AND o_orderkey IS NOT NULL)
      |WHERE rank <= 3
      |ORDER BY o_custkey, rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w5_topk_orders_agg" -> (topOrdersPerCustomer _),
    "w1_latest_order_per_customer" -> (latestOrderPerCustomer _),
    "w2_part_price_rank" -> (partPriceRank _),
    "w3_customer_order_gaps" -> (customerOrderGaps _),
    "w4_above_avg_parts" -> (aboveAvgParts _))

  val oracles: Map[String, String] = Map(
    "w5_topk_orders_agg" -> topOrdersPerCustomerSql,
    "w1_latest_order_per_customer" -> latestOrderPerCustomerSql,
    "w2_part_price_rank" -> partPriceRankSql,
    "w3_customer_order_gaps" -> customerOrderGapsSql,
    "w4_above_avg_parts" -> aboveAvgPartsSql)
}
