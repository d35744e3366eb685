package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Entity-resolution queries (extension tier): fuzzy matching of attribute
  * values that exact keys cannot join — the reconciliation step a curation
  * pipeline runs before any dedup/aggregation keyed on a human-entered
  * value. Built on [[graft.operators.EntityResolution]]; the reference has
  * no fuzzy matching anywhere (its brand/unit normalization, SURVEY §2
  * P5/P6, is exact-map lookup), so this is the same relationship the
  * streaming and temporal families have to theirs: the operator its data
  * model implies but its engine cannot express.
  */
object Entity {

  // ------------------------------------------------------------------ j4

  /** j4: merge-candidate discovery over part names. Distinct p_name values
    * blocked by their type token (the noun survives the adjective typo
    * class), paired within blocks at edit distance ≤ 2 — "cold anvil" vs
    * "old anvil". Canonical id = min part key; support counts ride along
    * so a downstream merge can pick the majority spelling.
    */
  def fuzzyPartMatches(spark: SparkSession, dir: String): DataFrame =
    graft.operators.EntityResolution.fuzzyMatches(
        Tables(spark, dir).part, idCol = "p_partkey", valueCol = "p_name",
        blockOf = v => split(v, " ").getItem(1), maxDist = 2)
      .orderBy("value_a", "value_b")

  /** DuckDB twin: same distinct-collapse, same blocking token, same
    * unblocked-pair predicate (plain levenshtein — DuckDB has no banded
    * form; ≤ maxDist is the same set).
    */
  val fuzzyPartMatchesSql: String =
    """WITH names AS (
      |  SELECT p_name AS value, min(p_partkey) AS canon_id,
      |         count(*) AS n_rows, split_part(p_name, ' ', 2) AS block
      |  FROM part GROUP BY p_name),
      |sized AS (
      |  SELECT n.* FROM names n
      |  JOIN (SELECT block FROM names GROUP BY block HAVING count(*) <= 1000)
      |    b USING (block))
      |SELECT a.value AS value_a, b.value AS value_b,
      |       levenshtein(a.value, b.value) AS dist,
      |       a.canon_id AS canon_id_a, b.canon_id AS canon_id_b,
      |       a.n_rows AS n_rows_a, b.n_rows AS n_rows_b
      |FROM sized a JOIN sized b
      |  ON a.block = b.block AND a.value < b.value
      | AND levenshtein(a.value, b.value) <= 2
      |ORDER BY value_a, value_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j4_fuzzy_match" -> (fuzzyPartMatches _))

  val oracles: Map[String, String] = Map(
    "j4_fuzzy_match" -> fuzzyPartMatchesSql)
}
