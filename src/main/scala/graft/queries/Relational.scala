package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** The Athena-equivalent relational surface over the lake (SURVEY §2.7–2.9).
  *
  * The reference's clean zone exists "for Athena performance"
  * (reference `data_cleaner/pnp-cleanerLambda.py:106`) but ships no query
  * layer; this module IS that layer, expressed Spark-first. Every query is a
  * declarative DataFrame plan — filters and projections reach the parquet
  * scan, aggregations get map-side partial combine, small dimensions are
  * broadcast — so the same code survives a 100 TB scale-up.
  *
  * Shared conventions (driver hash-compare parity):
  *  - every computed column is aliased identically in Spark and oracle SQL;
  *  - money sums rounded to 2 decimals, ratios to 4, in BOTH engines;
  *  - timestamps projected as 'yyyy-MM-dd' strings;
  *  - every result deterministically ordered with a unique tie-break.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  private def ts(s: String): Column = to_timestamp(lit(s))

  /** TPC-H Q1 shape: full-scan aggregate with map-side partial aggregation.
    * One shuffle on (returnflag, linestatus) — 6 groups, trivially balanced.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .filter(col("l_shipdate") <= ts("1999-12-31 00:00:00"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity), 2) AS sum_qty,
      | round(sum(l_extendedprice), 2) AS sum_base_price,
      | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      | round(avg(l_quantity), 4) AS avg_qty,
      | round(avg(l_discount), 4) AS avg_disc,
      | count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q2 shape: minimum-cost supplier — a correlated scalar subquery
    * ("the minimum effective unit price anyone shipped this part at"),
    * decorrelated the way Catalyst itself would: one window-min over the
    * part key instead of a per-row subquery. The oracle keeps the textbook
    * correlated spelling, so the gate proves the decorrelation is exact.
    *
    * Plan: part filter broadcasts into the fact scan, then ONE hash
    * exchange on l_partkey serves both the window min and the equality
    * filter; the tied (part, supplier) winners collapse in a tiny aggregate
    * and supplier/nation broadcast back in. The double division is computed
    * identically in both engines (IEEE), and min is order-independent, so
    * `eff = min(eff)` is bit-exact — the display value is rounded only
    * after the comparison.
    */
  def minCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val p = t.part.filter(col("p_size") <= 3).select("p_partkey", "p_name")
    // try_divide: under ANSI (Spark 4's default) a single l_quantity = 0
    // row would abort the whole job with DIVIDE_BY_ZERO, where the DuckDB
    // oracle's x/0.0 yields NULL and min() skips it — try_divide IS that
    // NULL, so the two engines degrade identically
    val eff = expr("try_divide(l_extendedprice, l_quantity)")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
    t.lineitem.select(col("l_partkey"), col("l_suppkey"), eff.as("eff"))
      // no broadcast() hint on SF-SCALING tables (part/supplier/customer
      // grow linearly with the corpus; at 100 TB none fit a broadcast,
      // and a mandatory hint bypasses autoBroadcastJoinThreshold into an
      // OOM/size abort — the e7 hazard class). AQE still broadcasts them
      // whenever they measure small, which is every fixture run; only
      // nation/region (25/5 rows, constant) keep the explicit hint.
      .join(p, col("l_partkey") === col("p_partkey"))
      .withColumn("min_eff", min("eff").over(w))
      .filter(col("eff") === col("min_eff"))
      .groupBy("p_partkey", "p_name", "l_suppkey")
      .agg(round(min("eff"), 2).as("unit_price"))
      .join(t.supplier.select("s_suppkey", "s_name", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select("p_partkey", "p_name", "s_name", "n_name", "unit_price")
      .orderBy("p_partkey", "s_name")
  }

  val minCostSupplierSql: String =
    """SELECT p_partkey, p_name, s_name, n_name,
      | round(min(l_extendedprice / l_quantity), 2) AS unit_price
      |FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_size <= 3
      |  AND l_extendedprice / l_quantity =
      |      (SELECT min(l2.l_extendedprice / l2.l_quantity)
      |       FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
      |GROUP BY p_partkey, p_name, s_name, n_name
      |ORDER BY p_partkey, s_name""".stripMargin

  /** TPC-H Q6 shape: selective scan + scalar aggregate. The three predicates
    * are all pushed to the parquet reader (PushedFilters); no shuffle at all
    * beyond the final single-row combine.
    */
  def revenueForecast(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .filter(
        col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("1997-01-01 00:00:00") &&
          col("l_discount") >= lit(0.03) && col("l_discount") <= lit(0.07) &&
          col("l_quantity") < lit(24))
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))

  val revenueForecastSql: String =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.03 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q3 shape: selective fact-fact join + top-k. `customer` is small
    * relative to the facts — AQE broadcasts it when it measures under the
    * threshold (every fixture run) and shuffles it at the scale where a
    * forced broadcast would abort; orders⋈lineitem shuffles on orderkey.
    * Top-k is computed with TakeOrderedAndProject (no full sort).
    */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val c = t.customer.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = t.orders.filter(col("o_orderdate") < ts("1998-01-01 00:00:00"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val l = t.lineitem.filter(col("l_shipdate") > ts("1998-01-01 00:00:00"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey")) // SF-scaled: AQE decides
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .select(
        col("l_orderkey"),
        col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
  }

  val shippingPrioritySql: String =
    """SELECT l_orderkey,
      | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      | strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q4 shape: EXISTS → left-semi join. The semi-join build side is the
    * filtered lineitem key set; AQE converts it to broadcast when small.
    */
  def orderPriorityCheck(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val o = t.orders.filter(
      col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
        col("o_orderdate") < ts("1996-07-01 00:00:00"))
    val bigLines = t.lineitem.filter(col("l_quantity") > lit(45)).select("l_orderkey")
    o.join(bigLines, o("o_orderkey") === bigLines("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val orderPriorityCheckSql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q5 shape: star join over 6 tables. Only the constant-size
    * dimensions (nation: 25 rows, region: 5 rows) carry broadcast hints;
    * customer and supplier grow linearly with the corpus, so their join
    * strategy is left to AQE — at fixture scale AQE still broadcasts
    * them, at 100 TB it shuffles instead of aborting on a forced
    * broadcast of a tens-of-GB table. Shuffles: orders⋈lineitem on
    * orderkey, the SF-scaling dim joins as AQE decides, and the final
    * 25-group aggregate.
    */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val o = t.orders.filter(
      col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
        col("o_orderdate") < ts("1998-01-01 00:00:00"))
      .select("o_orderkey", "o_custkey")
    t.lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(t.supplier.select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t.nation.select("n_nationkey", "n_name", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region.select("r_regionkey", "r_name")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(asc("r_name"), desc("revenue"), asc("n_name"))
  }

  val localSupplierVolumeSql: String =
    """SELECT r_name, n_name,
      | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY r_name, n_name
      |ORDER BY r_name, revenue DESC, n_name""".stripMargin

  /** TPC-H Q10 shape: returned-item revenue per customer, top 20. */
  def returnedItemRevenue(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val l = t.lineitem.filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(t.orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(t.customer.select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(spark, dir).nation.select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .select(col("c_custkey"), col("c_name"), round(col("c_acctbal"), 2).as("c_acctbal"),
        col("n_name"), col("revenue"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(20)
  }

  val returnedItemRevenueSql: String =
    """SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal, n_name,
      | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** TPC-H Q7 shape: bilateral trade flows — two broadcast nation dims
    * aliased independently, facts shuffle once on their join keys, then a
    * tiny (nation, nation, year) aggregate.
    */
  def nationTrade(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val pair = Seq("NATION_1", "NATION_2")
    val n1 = t.nation.filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
    val n2 = t.nation.filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
    t.lineitem
      .join(t.supplier.select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(t.orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(t.customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("sk"))
      .join(broadcast(n2), col("c_nationkey") === col("ck"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val nationTradeSql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      | CAST(year(l_shipdate) AS BIGINT) AS l_year,
      | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE n1.n_name IN ('NATION_1', 'NATION_2')
      |  AND n2.n_name IN ('NATION_1', 'NATION_2')
      |  AND n1.n_name <> n2.n_name
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin

  /** TPC-H Q8 shape: a brand's share of regional revenue per year —
    * conditional aggregation over a five-way join, every dimension
    * broadcast.
    */
  def brandMarketShare(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val regionNations = t.nation
      .join(broadcast(t.region.filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey")
    val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
    t.lineitem
      .join(t.orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(t.customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(regionNations), col("c_nationkey") === col("n_nationkey"))
      .join(Tables(spark, dir).part.select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey")) // SF-scaled: AQE decides
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      // try_divide: a year whose volume sums to 0.0 must yield NULL like
      // the oracle's x/0.0, not abort the job under ANSI
      .agg(round(
        expr("try_divide(" +
          "sum(CASE WHEN p_brand = 'Brand#1' " +
          "THEN l_extendedprice * (1 - l_discount) ELSE 0.0D END), " +
          "sum(l_extendedprice * (1 - l_discount)))"),
        4).as("brand1_share"))
      .orderBy("o_year")
  }

  val brandMarketShareSql: String =
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      | round(sum(CASE WHEN p_brand = 'Brand#1'
      |              THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
      |   / sum(l_extendedprice * (1 - l_discount)), 4) AS brand1_share
      |FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  JOIN part ON l_partkey = p_partkey
      |WHERE r_name = 'EUROPE'
      |GROUP BY 1
      |ORDER BY o_year""".stripMargin

  /** TPC-H Q9 shape: pseudo-profit by supplier nation and year for a
    * name-filtered part subset (no partsupp table in the synthetic schema,
    * so cost = half retail price x quantity).
    */
  def productProfit(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val p = t.part.filter(col("p_name").contains("a"))
      .select("p_partkey", "p_retailprice")
    val profit = col("l_extendedprice") * (lit(1) - col("l_discount")) -
      col("p_retailprice") * lit(0.5) * col("l_quantity")
    t.lineitem
      // no broadcast() hint on SF-SCALING tables (part/supplier/customer
      // grow linearly with the corpus; at 100 TB none fit a broadcast,
      // and a mandatory hint bypasses autoBroadcastJoinThreshold into an
      // OOM/size abort — the e7 hazard class). AQE still broadcasts them
      // whenever they measure small, which is every fixture run; only
      // nation/region (25/5 rows, constant) keep the explicit hint.
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(t.supplier.select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(round(sum(profit), 2).as("profit"))
      .orderBy("nation", "l_year")
  }

  val productProfitSql: String =
    """SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS l_year,
      | round(sum(l_extendedprice * (1 - l_discount)
      |   - p_retailprice * 0.5 * l_quantity), 2) AS profit
      |FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |WHERE contains(p_name, 'a')
      |GROUP BY 1, 2
      |ORDER BY nation, l_year""".stripMargin

  /** q11: METADATA-ONLY table stats — full-table COUNT/MIN/MAX answered
    * from parquet FOOTERS, not data pages (`spark.sql.parquet
    * .aggregatePushdown`; the plan shows `PushedAggregation` and the scan
    * reads zero row groups' worth of column data). At 100 TB this is the
    * difference between a catalog-refresh job that touches metadata and
    * one that scans the lake: row counts and column bounds are exactly
    * what footers already store. Constraints are structural — no filter,
    * no grouping, and timestamp columns are excluded from footer min/max
    * pushdown (hence the long/double columns here).
    *
    * Aggregate pushdown exists only in the DataSource V2 parquet reader,
    * and removing parquet from `useV1SourceList` is session-global — so
    * the query plans in an ISOLATED child session (same SparkContext,
    * executors, and cache; the d9 CC-loop conf-isolation prescription)
    * and the caller's session never sees either conf. PlanSpec pins the
    * `PushedAggregation` marker so a silent fallback to a scanning plan
    * fails CI.
    */
  def metadataStats(spark: SparkSession, dir: String): DataFrame = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.sources.useV1SourceList", "")
    s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    Tables(s2, dir).lineitem
      .agg(count(lit(1)).as("n_rows"),
        min("l_orderkey").as("min_key"), max("l_orderkey").as("max_key"),
        round(max("l_extendedprice"), 2).as("max_price"))
  }

  val metadataStatsSql: String =
    """SELECT count(*) AS n_rows,
      | min(l_orderkey) AS min_key, max(l_orderkey) AS max_key,
      | round(max(l_extendedprice), 2) AS max_price
      |FROM lineitem""".stripMargin

  val queries: Map[String, Q] = Map(
    "q11_metadata_stats" -> (metadataStats _),
    "q1_pricing_summary" -> (pricingSummary _),
    "q2_min_cost_supplier" -> (minCostSupplier _),
    "q3_shipping_priority" -> (shippingPriority _),
    "q4_order_priority_check" -> (orderPriorityCheck _),
    "q5_local_supplier_volume" -> (localSupplierVolume _),
    "q6_revenue_forecast" -> (revenueForecast _),
    "q7_nation_trade" -> (nationTrade _),
    "q8_brand_market_share" -> (brandMarketShare _),
    "q9_product_profit" -> (productProfit _),
    "q10_returned_item_revenue" -> (returnedItemRevenue _))

  val oracles: Map[String, String] = Map(
    "q11_metadata_stats" -> metadataStatsSql,
    "q1_pricing_summary" -> pricingSummarySql,
    "q2_min_cost_supplier" -> minCostSupplierSql,
    "q3_shipping_priority" -> shippingPrioritySql,
    "q4_order_priority_check" -> orderPriorityCheckSql,
    "q5_local_supplier_volume" -> localSupplierVolumeSql,
    "q6_revenue_forecast" -> revenueForecastSql,
    "q7_nation_trade" -> nationTradeSql,
    "q8_brand_market_share" -> brandMarketShareSql,
    "q9_product_profit" -> productProfitSql,
    "q10_returned_item_revenue" -> returnedItemRevenueSql)
}
