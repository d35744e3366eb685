package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** String/scalar-function surface (SURVEY §2.9): the reference's cleaning
  * stages are entirely trim/lower/regex/split/substring transforms; these
  * queries exercise the same built-ins over the synthetic tables so they are
  * oracle-checkable. All pure projections — codegen'd, no shuffle except the
  * explode's implicit row fan-out.
  */
object Strings {

  /** Tokenize part names — the explode/flatten shape (SURVEY §2.5 G-family). */
  def partTokens(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).part
      .select(col("p_partkey"), explode(split(col("p_name"), " ")).as("token"))
      .orderBy("p_partkey", "token")

  val partTokensSql: String =
    """SELECT p_partkey, unnest(string_split(p_name, ' ')) AS token
      |FROM part
      |ORDER BY p_partkey, token""".stripMargin

  /** Scalar string functions: case, length, regex extract, substring, concat. */
  def partStringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).part
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        length(col("p_name")).cast("long").as("name_len"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        substring(col("p_type"), 1, 3).as("type_prefix"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy("p_partkey")

  val partStringFuncsSql: String =
    """SELECT p_partkey,
      | upper(p_name) AS name_upper,
      | CAST(length(p_name) AS BIGINT) AS name_len,
      | regexp_extract(p_name, '^(\w+)', 1) AS first_word,
      | substring(p_type, 1, 3) AS type_prefix,
      | concat_ws('-', p_brand, p_type) AS brand_type
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  /** Calendar matrix: year/month extraction + aggregates. */
  def orderMonthMatrix(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .groupBy(
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mon"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("revenue"),
        round(avg("o_totalprice"), 4).as("avg_price"))
      .orderBy("yr", "mon")

  val orderMonthMatrixSql: String =
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
      | CAST(month(o_orderdate) AS BIGINT) AS mon,
      | count(*) AS n_orders,
      | round(sum(o_totalprice), 2) AS revenue,
      | round(avg(o_totalprice), 4) AS avg_price
      |FROM orders
      |GROUP BY 1, 2
      |ORDER BY yr, mon""".stripMargin

  /** The reference's brand-normalization shape (SURVEY P5): a map-literal
    * lookup with identity fallback, applied here to p_brand. Pure built-ins
    * (no UDF) so Catalyst constant-folds the dictionary.
    */
  def brandNormalize(spark: SparkSession, dir: String): DataFrame = {
    val dict = map(
      lit("Brand#1"), lit("B1"),
      lit("Brand#2"), lit("B2"),
      lit("Brand#3"), lit("B3"))
    Tables(spark, dir).part
      .select(
        col("p_partkey"),
        coalesce(element_at(dict, trim(col("p_brand"))), trim(col("p_brand")))
          .as("brand_norm"))
      .orderBy("p_partkey")
  }

  val brandNormalizeSql: String =
    """SELECT p_partkey,
      | CASE trim(p_brand)
      |   WHEN 'Brand#1' THEN 'B1'
      |   WHEN 'Brand#2' THEN 'B2'
      |   WHEN 'Brand#3' THEN 'B3'
      |   ELSE trim(p_brand) END AS brand_norm
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  /** The reference's unit-normalization shape (SURVEY P6): regex branch that
    * strips an embedded magnitude ("8kg" → "kg") + synonym map fallback,
    * applied to a synthesized unit-ish column built from part attributes.
    */
  def unitNormalize(spark: SparkSession, dir: String): DataFrame = {
    val raw = lower(trim(concat(col("p_size").cast("string"),
      when(col("p_size") % 2 === 0, lit("kg")).otherwise(lit("g")))))
    val dict = map(
      lit("l"), lit("litre"), lit("litre"), lit("litre"), lit("litres"), lit("litre"))
    Tables(spark, dir).part
      .select(col("p_partkey"), raw.as("unit_raw"),
        when(raw.rlike("^\\d+(kg|g|ml|l)$"), regexp_extract(raw, "(kg|g|ml|l)$", 1))
          .otherwise(coalesce(element_at(dict, raw), raw))
          .as("unit_norm"))
      .orderBy("p_partkey")
  }

  val unitNormalizeSql: String =
    """SELECT p_partkey, unit_raw,
      | CASE WHEN regexp_matches(unit_raw, '^\d+(kg|g|ml|l)$')
      |      THEN regexp_extract(unit_raw, '(kg|g|ml|l)$', 1)
      |      WHEN unit_raw IN ('l', 'litre', 'litres') THEN 'litre'
      |      ELSE unit_raw END AS unit_norm
      |FROM (SELECT p_partkey,
      |        lower(trim(CAST(p_size AS VARCHAR) ||
      |          CASE WHEN p_size % 2 = 0 THEN 'kg' ELSE 'g' END)) AS unit_raw
      |      FROM part)
      |ORDER BY p_partkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f1_part_tokens" -> (partTokens _),
    "f2_part_string_funcs" -> (partStringFuncs _),
    "f3_order_month_matrix" -> (orderMonthMatrix _),
    "f4_brand_normalize" -> (brandNormalize _),
    "f5_unit_normalize" -> (unitNormalize _))

  val oracles: Map[String, String] = Map(
    "f1_part_tokens" -> partTokensSql,
    "f2_part_string_funcs" -> partStringFuncsSql,
    "f3_order_month_matrix" -> orderMonthMatrixSql,
    "f4_brand_normalize" -> brandNormalizeSql,
    "f5_unit_normalize" -> unitNormalizeSql)
}
