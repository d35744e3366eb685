package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Data-profiling operators — the quality gate every corpus ingest runs
  * BEFORE heavier work (the Deequ/data-profiler class of tooling):
  * per-column statistics in one scan (pr1) and grouping-key skew
  * diagnostics (pr2), the measurement that decides whether a downstream
  * join/aggregate needs salting (Sketches.saltedRollup is the remedy this
  * report dispatches to).
  */
object Profiling {

  /** pr1: COLUMN PROFILE — null ratio, exact distinct count, and typed
    * stats (min/max/mean/std for the numeric column; lengths for text)
    * for every column of `documents`, long-form (col_name, metric
    * columns).
    *
    * Scale shape: ONE scan feeding one global aggregate. Mean/std use
    * exact power sums accumulated in DECIMAL(38,0) (BIGINT would overflow
    * ANSI-loudly on sum(len²) around 1e9 long documents; decimal sums are
    * exact in both engines — DuckDB's BIGINT sum is already HUGEINT) and
    * divided back in a fixed double-op order — never stddev_samp, whose
    * streaming M2 merge order is parallelism-dependent, so Spark and
    * DuckDB would disagree in the last ulps; the power-sum spelling is
    * bit-stable at any parallelism because integer addition commutes
    * exactly. The multi-column exact DISTINCT is the one deliberately
    * expensive piece: Catalyst plans it as an Expand (one input row per
    * distinct aggregate), the honest price of exactness; the 100 TB dial
    * is approx_count_distinct (HLL) per column — same single-scan shape,
    * no Expand — which this report keeps exact so the DuckDB oracle can
    * agree to the digit.
    */
  def columnProfile(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val dec = "decimal(38,0)"
    val agg = d.agg(
      count(lit(1)).as("n"),
      // null counts
      sum(when(col("doc_id").isNull, 1L).otherwise(0L)).as("nn_doc_id"),
      sum(when(col("text").isNull, 1L).otherwise(0L)).as("nn_text"),
      sum(when(col("lang").isNull, 1L).otherwise(0L)).as("nn_lang"),
      sum(when(col("source").isNull, 1L).otherwise(0L)).as("nn_source"),
      sum(when(col("n_chars").isNull, 1L).otherwise(0L)).as("nn_n_chars"),
      // exact distincts
      countDistinct(col("doc_id")).as("nd_doc_id"),
      countDistinct(col("text")).as("nd_text"),
      countDistinct(col("lang")).as("nd_lang"),
      countDistinct(col("source")).as("nd_source"),
      countDistinct(col("n_chars")).as("nd_n_chars"),
      // numeric stats over n_chars: exact decimal power sums
      min(col("n_chars")).as("min_n_chars"),
      max(col("n_chars")).as("max_n_chars"),
      sum(col("n_chars").cast(dec)).as("s1"),
      sum((col("n_chars") * col("n_chars")).cast(dec)).as("s2"),
      count(col("n_chars")).as("cnt_nc"),
      // text lengths: exact sum + max
      sum(length(col("text")).cast(dec)).as("slen"),
      max(length(col("text")).cast("long")).as("max_len"),
      count(col("text")).as("cnt_txt"))
    // fixed-order double ops, identical in the oracle: mean = s1/n;
    // var_samp = (s2 - s1·mean)/(n-1) — one subtraction, no M2 merge
    val prof = agg.select(
      col("*"),
      (col("s1").cast("double") / nullif(col("cnt_nc"), lit(0))).as("mean_nc"),
      sqrt((col("s2").cast("double") - col("s1").cast("double") *
        (col("s1").cast("double") / nullif(col("cnt_nc"), lit(0)))) /
        nullif(col("cnt_nc") - 1, lit(0))).as("std_nc"),
      (col("slen").cast("double") / nullif(col("cnt_txt"), lit(0))).as("avg_len"))
    val nulls = (c: String) =>
      s"round(CAST(nn_$c AS DOUBLE) / nullif(n, 0), 6), CAST(nd_$c AS DOUBLE)"
    prof.select(expr(
      s"""stack(5,
         |  'doc_id',  ${nulls("doc_id")},  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
         |  'text',    ${nulls("text")},    CAST(NULL AS DOUBLE), CAST(max_len AS DOUBLE), round(avg_len, 6), CAST(NULL AS DOUBLE),
         |  'lang',    ${nulls("lang")},    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
         |  'source',  ${nulls("source")},  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
         |  'n_chars', ${nulls("n_chars")}, CAST(min_n_chars AS DOUBLE), CAST(max_n_chars AS DOUBLE), round(mean_nc, 6), round(std_nc, 6)
         |) AS (col_name, null_ratio, n_distinct, min_val, max_val, mean_val, std_val)"""
        .stripMargin))
      .orderBy("col_name")
  }

  val columnProfileSql: String = {
    def row(name: String, mins: String, maxs: String, means: String,
        stds: String) =
      s"""SELECT '$name' AS col_name,
         |  round(CAST(nn_$name AS DOUBLE) / nullif(n, 0), 6) AS null_ratio,
         |  CAST(nd_$name AS DOUBLE) AS n_distinct,
         |  $mins AS min_val, $maxs AS max_val,
         |  $means AS mean_val, $stds AS std_val FROM prof""".stripMargin
    val nul = "CAST(NULL AS DOUBLE)"
    s"""WITH agg AS (
       |  SELECT count(*) AS n,
       |    sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS nn_doc_id,
       |    sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS nn_text,
       |    sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS nn_lang,
       |    sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS nn_source,
       |    sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS nn_n_chars,
       |    count(DISTINCT doc_id) AS nd_doc_id,
       |    count(DISTINCT text) AS nd_text,
       |    count(DISTINCT lang) AS nd_lang,
       |    count(DISTINCT source) AS nd_source,
       |    count(DISTINCT n_chars) AS nd_n_chars,
       |    min(n_chars) AS min_n_chars,
       |    max(n_chars) AS max_n_chars,
       |    sum(n_chars) AS s1,
       |    sum(n_chars * n_chars) AS s2,
       |    count(n_chars) AS cnt_nc,
       |    sum(length(text)) AS slen,
       |    max(length(text)) AS max_len,
       |    count(text) AS cnt_txt
       |  FROM documents),
       |prof AS (
       |  SELECT *,
       |    CAST(s1 AS DOUBLE) / nullif(cnt_nc, 0) AS mean_nc,
       |    sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) *
       |      (CAST(s1 AS DOUBLE) / nullif(cnt_nc, 0))) /
       |      nullif(cnt_nc - 1, 0)) AS std_nc,
       |    CAST(slen AS DOUBLE) / nullif(cnt_txt, 0) AS avg_len
       |  FROM agg)
       |${row("doc_id", nul, nul, nul, nul)}
       |UNION ALL
       |${row("text", nul, "CAST(max_len AS DOUBLE)", "round(avg_len, 6)", nul)}
       |UNION ALL
       |${row("lang", nul, nul, nul, nul)}
       |UNION ALL
       |${row("source", nul, nul, nul, nul)}
       |UNION ALL
       |${row("n_chars", "CAST(min_n_chars AS DOUBLE)",
            "CAST(max_n_chars AS DOUBLE)", "round(mean_nc, 6)",
            "round(std_nc, 6)")}
       |ORDER BY col_name""".stripMargin
  }

  /** pr2: GROUPING-KEY SKEW PROFILE — the generic
    * [[graft.operators.SkewProfile]] operator (any frame, any declared
    * candidate keys — scale shape, exact-count parity and the
    * heap/no-window plan documented there) bound to `events`' two
    * candidate shuffle keys. This is the measurement that decides salting
    * (a large skew_ratio is exactly the shape that stalls a shuffle stage
    * on one reducer; Sketches.saltedRollup is the remedy, AQE skew-join
    * the runtime backstop; z4's Misra–Gries heavy hitters the streaming
    * estimate of the same quantity).
    */
  def skewProfile(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SkewProfile.report(
      Tables(spark, dir).events, Seq("user_id", "event_type"))

  val skewProfileSql: String = {
    def one(key: String) =
      s"""SELECT '$key' AS key_col, n_rows, n_keys, max_cnt,
         |  round(CAST(max_cnt AS DOUBLE) / n_rows, 6) AS top1_share,
         |  round(top10 / CAST(n_rows AS DOUBLE), 6) AS top10_share,
         |  round(CAST(max_cnt AS DOUBLE) /
         |    (CAST(n_rows AS DOUBLE) / n_keys), 6) AS skew_ratio
         |FROM (
         |  SELECT CAST(sum(cnt) AS BIGINT) AS n_rows, count(*) AS n_keys,
         |    max(cnt) AS max_cnt,
         |    sum(CASE WHEN rnk <= 10 THEN CAST(cnt AS DOUBLE) ELSE 0.0 END) AS top10
         |  FROM (
         |    SELECT cnt, row_number() OVER (ORDER BY cnt DESC) AS rnk
         |    FROM (SELECT CAST($key AS VARCHAR) AS k, count(*) AS cnt
         |          FROM events WHERE $key IS NOT NULL GROUP BY 1)))""".stripMargin
    s"""${one("user_id")}
       |UNION ALL
       |${one("event_type")}
       |ORDER BY key_col""".stripMargin
  }

  /** pr3: CONSTRAINT VALIDATION — the ingest gate run before promoting a
    * documents zone, through the generic graft.operators.DataChecks
    * operator (one scan, one row per declared constraint). The declared
    * set exercises every check kind AND a deliberately failing policy
    * gate: `english_majority` (the "corpus must be ≥50% English" mix
    * policy) reports `passed = false` on this fixture — a validation
    * report that can only say yes is not a gate, and the oracle hash pins
    * the failure row as hard as the passes.
    */
  def constraintReport(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.DataChecks._
    report(Tables(spark, dir).documents, Seq(
      RowCheck("not_null_doc_id", "doc_id IS NOT NULL"),
      UniqueCheck("unique_doc_id", "doc_id"),
      // null-safe equality: a row where BOTH are null is consistent
      RowCheck("n_chars_consistent", "n_chars <=> length(text)"),
      RowCheck("known_lang", "lang IN ('de', 'en', 'es', 'fr', 'zh')"),
      RowCheck("min_text_length", "length(text) >= 20", threshold = 0.9),
      RowCheck("english_majority", "lang = 'en'", threshold = 0.5)))
  }

  val constraintReportSql: String = {
    // the verdict mirrors DataChecks.reportRow's EXACT integer compare
    // (never the rounded display rate), including the empty-frame-fails
    // guard
    def row(name: String, sat: String, thr: Double) = {
      val thrScaled = math.round(thr * 1000000L)
      s"""SELECT '$name' AS check_name, CAST($sat AS BIGINT) AS satisfied,
         |  n_total AS total,
         |  round(CAST($sat AS DOUBLE) / nullif(n_total, 0), 6) AS rate,
         |  n_total > 0 AND CAST($sat AS BIGINT) * 1000000 >= $thrScaled * n_total
         |    AS passed
         |FROM agg""".stripMargin
    }
    s"""WITH agg AS (
       |  SELECT count(*) AS n_total,
       |    sum(CASE WHEN doc_id IS NOT NULL THEN 1 ELSE 0 END) AS ok_nn,
       |    count(doc_id) AS nn_id, count(DISTINCT doc_id) AS nd_id,
       |    sum(CASE WHEN n_chars IS NOT DISTINCT FROM length(text)
       |        THEN 1 ELSE 0 END) AS ok_nc,
       |    sum(CASE WHEN lang IN ('de', 'en', 'es', 'fr', 'zh')
       |        THEN 1 ELSE 0 END) AS ok_lang,
       |    sum(CASE WHEN length(text) >= 20 THEN 1 ELSE 0 END) AS ok_len,
       |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ok_en
       |  FROM documents)
       |${row("not_null_doc_id", "ok_nn", 1.0)}
       |UNION ALL
       |${row("unique_doc_id", "(n_total - (nn_id - nd_id))", 1.0)}
       |UNION ALL
       |${row("n_chars_consistent", "ok_nc", 1.0)}
       |UNION ALL
       |${row("known_lang", "ok_lang", 1.0)}
       |UNION ALL
       |${row("min_text_length", "ok_len", 0.9)}
       |UNION ALL
       |${row("english_majority", "ok_en", 0.5)}
       |ORDER BY check_name""".stripMargin
  }

  /** pr4: REFERENTIAL-INTEGRITY report — orphan rates over the star
    * schema's FK edges (child keys that resolve to no parent row: the
    * broken-linkage diagnostic an ingest runs after every load), through
    * the same generic DataChecks operator. Each edge is one pass over the
    * child joined to the DISTINCT parent keys; SQL FK semantics — null
    * child keys are not orphans (DataChecksSpec pins the convention).
    */
  def fkIntegrity(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.DataChecks._
    val t = Tables(spark, dir)
    report(t.lineitem, Seq(
      FkCheck("fk_lineitem_order", "l_orderkey", t.orders, "o_orderkey"),
      FkCheck("fk_lineitem_part", "l_partkey", t.part, "p_partkey"),
      FkCheck("fk_lineitem_supplier", "l_suppkey", t.supplier, "s_suppkey")))
  }

  val fkIntegritySql: String = {
    def edge(name: String, ck: String, parent: String, pk: String) =
      s"""SELECT '$name' AS check_name,
         |  CAST(n_total - orphans AS BIGINT) AS satisfied,
         |  n_total AS total,
         |  round(CAST(n_total - orphans AS DOUBLE) / nullif(n_total, 0), 6) AS rate,
         |  n_total > 0 AND
         |    CAST(n_total - orphans AS BIGINT) * 1000000 >= 1000000 * n_total
         |    AS passed
         |FROM (
         |  SELECT count(*) AS n_total,
         |    sum(CASE WHEN c.$ck IS NOT NULL AND p.k IS NULL
         |        THEN 1 ELSE 0 END) AS orphans
         |  FROM lineitem c
         |    LEFT JOIN (SELECT DISTINCT $pk AS k FROM $parent) p
         |      ON p.k = c.$ck)""".stripMargin
    s"""${edge("fk_lineitem_order", "l_orderkey", "orders", "o_orderkey")}
       |UNION ALL
       |${edge("fk_lineitem_part", "l_partkey", "part", "p_partkey")}
       |UNION ALL
       |${edge("fk_lineitem_supplier", "l_suppkey", "supplier", "s_suppkey")}
       |ORDER BY check_name""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pr1_column_profile" -> (columnProfile _),
    "pr2_skew_profile" -> (skewProfile _),
    "pr3_constraint_report" -> (constraintReport _),
    "pr4_fk_integrity" -> (fkIntegrity _))

  val oracles: Map[String, String] = Map(
    "pr1_column_profile" -> columnProfileSql,
    "pr2_skew_profile" -> skewProfileSql,
    "pr3_constraint_report" -> constraintReportSql,
    "pr4_fk_integrity" -> fkIntegritySql)
}
