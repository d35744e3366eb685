package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental maintenance of additive rollups — the batch counterpart of
  * st2's streaming update-mode aggregate, for scheduled (e.g. nightly)
  * ingest: fold a delta of fact rows into a persisted per-key state of
  * additive measures (counts + sums), so the pipeline never re-scans its
  * history to refresh a dashboard table. The reference's clean zone is
  * rebuilt per-catalogue for exactly this reason (reference
  * `data_cleaner/pnp-cleanerLambda.py:96-118` — full partition overwrite);
  * this operator is the O(delta) refresh that replaces the O(history)
  * rebuild.
  *
  * Additivity is the contract: every measure must be a commutative monoid
  * fold (count, sum — avg is derived as sum/count by the caller at read
  * time), so delta-at-a-time folding equals the one-shot aggregate over
  * the union (spec-pinned, and e5's gate checks it against DuckDB's
  * one-shot oracle).
  *
  * Scale shape (the d14 ledger discipline): per-ingest cost is
  * DELTA-sized, never state-sized. The delta collapses to its own partial
  * rollup first (the only data shuffle, delta-keyed); its key list then
  * broadcasts twice — a semi-join prunes the state to touched keys (a
  * delta-bounded slice that merges by concatenation + re-aggregate), an
  * anti-join passes untouched state rows through untouched. The state —
  * one row per key ever seen, the honest dashboard-table size — is only
  * ever SCANNED; persisting it as parquet bucketed by the keys makes the
  * scan+prune partition-local on a cluster.
  */
object Rollups {

  /** The zero state: one row per (key..., n_events, total_value). */
  def emptyRollup(spark: SparkSession, keys: Seq[(String, DataType)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(
        keys.map { case (n, t) => StructField(n, t) } ++ Seq(
          StructField("n_events", LongType),
          StructField("total_value", DoubleType))))

  /** Fold one delta into the state. `delta` must already carry the key
    * columns plus a double `value` column; returns the updated state
    * (same schema as the input state). Measures stay RAW in state — any
    * display rounding happens at read time, after the last fold, so
    * folding order cannot move a rounded boundary mid-stream.
    *
    * Key matching is NULL-SAFE (`<=>`), because groupBy treats NULL as one
    * ordinary key: under plain equi-joins a NULL-key state row slipped the
    * semi-join (never merged) while surviving the anti-join (passed
    * through), so every fold carrying NULL-key delta rows APPENDED a fresh
    * NULL-key row beside the old one — an ever-growing split of one group
    * that a one-shot GROUP BY (the e5 oracle) reports as a single row.
    *
    * Honesty note on total_value: the double sum is a commutative monoid
    * only up to float rounding — addition is not associative, so
    * delta-at-a-time folding matches the one-shot aggregate bit-for-bit on
    * well-conditioned values (the gate's regime, and typical metric data)
    * but can drift at catastrophic-cancellation magnitudes (±1e15 pairs).
    * Callers needing bit-stable folds at any input quantize the measure to
    * BIGINT at ingest (the RankFusion fixed-point discipline); n_events is
    * exact regardless.
    */
  def fold(delta: DataFrame, state: DataFrame, keys: Seq[String]): DataFrame = {
    val deltaAgg = delta.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
    val deltaKeys = deltaAgg.select(keys.map(col): _*).alias("__dk")
    val s = state.alias("__state")
    val cond = keys.map(k => col(s"__state.$k") <=> col(s"__dk.$k"))
      .reduce(_ && _)
    val untouched = s.join(broadcast(deltaKeys), cond, "left_anti")
    val merged = s.join(broadcast(deltaKeys), cond, "left_semi")
      .unionByName(deltaAgg)
      .groupBy(keys.map(col): _*)
      .agg(sum("n_events").as("n_events"), sum("total_value").as("total_value"))
    untouched.unionByName(merged)
  }
}
