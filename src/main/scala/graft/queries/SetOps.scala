package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Set operations, grouping sets, distinct aggregates, semi/anti joins and
  * HAVING — the remainder of the Athena-equivalent SQL surface (SURVEY §2.7,
  * §2.8). All shapes shuffle on bounded key domains; INTERSECT/EXCEPT
  * compile to hash-aggregate + join under Catalyst.
  */
object SetOps {

  private def custkeysInYear(t: Tables, year: Int): DataFrame =
    t.orders
      .filter(col("o_orderdate") >= to_timestamp(lit(s"$year-01-01 00:00:00")) &&
        col("o_orderdate") < to_timestamp(lit(s"${year + 1}-01-01 00:00:00")))
      .select("o_custkey")

  /** Customers active in both 1996 and 1997 (INTERSECT). */
  def repeatCustomers(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    custkeysInYear(t, 1996).intersect(custkeysInYear(t, 1997)).orderBy("o_custkey")
  }

  val repeatCustomersSql: String =
    """SELECT o_custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |INTERSECT
      |SELECT o_custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |ORDER BY o_custkey""".stripMargin

  /** Customers active in 1996 but not 1997 (EXCEPT). */
  def lapsedCustomers(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    custkeysInYear(t, 1996).except(custkeysInYear(t, 1997)).orderBy("o_custkey")
  }

  val lapsedCustomersSql: String =
    """SELECT o_custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |EXCEPT
      |SELECT o_custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |ORDER BY o_custkey""".stripMargin

  /** Tagged UNION ALL of two order segments, then re-aggregated. */
  def prioritySegments(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(lit("urgent").as("seg"), col("o_totalprice"))
    val low = o.filter(col("o_orderpriority") === "5-LOW")
      .select(lit("low").as("seg"), col("o_totalprice"))
    urgent.unionAll(low)
      .groupBy("seg")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("revenue"))
      .orderBy("seg")
  }

  val prioritySegmentsSql: String =
    """SELECT seg, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
      |FROM (
      |  SELECT 'urgent' AS seg, o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT'
      |  UNION ALL
      |  SELECT 'low' AS seg, o_totalprice FROM orders WHERE o_orderpriority = '5-LOW')
      |GROUP BY seg
      |ORDER BY seg""".stripMargin

  /** ROLLUP over (status, priority); subtotal rows surfaced as 'ALL' so both
    * engines agree without null-ordering concerns.
    */
  def orderStatusRollup(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("revenue"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("revenue"))
      .orderBy("status", "priority")

  val orderStatusRollupSql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      | coalesce(o_orderpriority, 'ALL') AS priority,
      | count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
      |FROM orders
      |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** Distinct aggregates per order status. */
  def distinctCounts(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .groupBy("o_orderstatus")
      .agg(
        countDistinct("o_custkey").as("n_customers"),
        countDistinct("o_orderpriority").as("n_priorities"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderstatus")

  val distinctCountsSql: String =
    """SELECT o_orderstatus,
      | count(DISTINCT o_custkey) AS n_customers,
      | count(DISTINCT o_orderpriority) AS n_priorities,
      | count(*) AS n_orders
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** Customers with no orders at all — left-anti join (NOT EXISTS). */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .join(t.orders.select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  val customersWithoutOrdersSql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** HAVING over a grouped aggregate: high-frequency customers. */
  def frequentBuyers(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total_spend"))
      .filter(col("n_orders") >= 12)
      .orderBy("o_custkey")

  val frequentBuyersSql: String =
    """SELECT o_custkey, count(*) AS n_orders,
      | round(sum(o_totalprice), 2) AS total_spend
      |FROM orders
      |GROUP BY o_custkey
      |HAVING count(*) >= 12
      |ORDER BY o_custkey""".stripMargin

  /** TPC-H Q14 shape: conditional aggregation over a part join. No forced
    * broadcast: part SCALES with the corpus, so a mandatory hint would
    * bypass the size threshold and abort at 100 TB — AQE broadcasts it at
    * every scale where it actually fits (including all fixture runs).
    */
  def promoRevenuePct(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    t.lineitem.select("l_partkey", "l_extendedprice", "l_discount")
      .join(t.part.select("p_partkey", "p_type"),
        col("l_partkey") === col("p_partkey"))
      // try_divide: a corpus whose revenue sums to 0.0 must yield NULL
      // like the oracle's x/0.0, not abort the job under ANSI
      .agg(round(
        expr("try_divide(" +
          "100.0D * sum(CASE WHEN p_type = 'PROMO' " +
          "THEN l_extendedprice * (1 - l_discount) ELSE 0.0D END), " +
          "sum(l_extendedprice * (1 - l_discount)))"),
        4).as("promo_pct"))
  }

  val promoRevenuePctSql: String =
    """SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
      |   THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
      |   / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
      |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin

  /** CUBE with grouping indicators (completing the grouping-sets surface
    * next to s4's ROLLUP): all four aggregation levels in one pass, with
    * grouping_id disambiguating genuine values from rolled-up totals —
    * Spark expands the cube map-side, so it still costs one shuffle.
    */
  def statusPriorityCube(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .cube("o_orderstatus", "o_orderpriority")
      .agg(grouping_id().as("gid"), count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("revenue"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("gid"), col("n_orders"), col("revenue"))
      .orderBy("gid", "status", "priority")

  val statusPriorityCubeSql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      | coalesce(o_orderpriority, 'ALL') AS priority,
      | CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
      | count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY gid, status, priority""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s9_status_priority_cube" -> (statusPriorityCube _),
    "s1_repeat_customers_intersect" -> (repeatCustomers _),
    "s2_lapsed_customers_except" -> (lapsedCustomers _),
    "s3_priority_segments_union" -> (prioritySegments _),
    "s4_order_status_rollup" -> (orderStatusRollup _),
    "s5_distinct_counts" -> (distinctCounts _),
    "s6_customers_without_orders" -> (customersWithoutOrders _),
    "s7_frequent_buyers_having" -> (frequentBuyers _),
    "s8_promo_revenue_pct" -> (promoRevenuePct _))

  val oracles: Map[String, String] = Map(
    "s9_status_priority_cube" -> statusPriorityCubeSql,
    "s1_repeat_customers_intersect" -> repeatCustomersSql,
    "s2_lapsed_customers_except" -> lapsedCustomersSql,
    "s3_priority_segments_union" -> prioritySegmentsSql,
    "s4_order_status_rollup" -> orderStatusRollupSql,
    "s5_distinct_counts" -> distinctCountsSql,
    "s6_customers_without_orders" -> customersWithoutOrdersSql,
    "s7_frequent_buyers_having" -> frequentBuyersSql,
    "s8_promo_revenue_pct" -> promoRevenuePctSql)
}
