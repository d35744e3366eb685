package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE's skew-join splitting handles JOIN skew at
  * runtime (enabled in GraftSession); aggregation skew over very-low-
  * cardinality keys is handled here by classic two-phase salting: hash rows
  * into `saltBuckets` sub-groups, pre-aggregate on (keys, salt), then merge
  * the partials — the hot key's work spreads over `saltBuckets` tasks
  * instead of one.
  *
  * (For algebraic aggregates Spark's own partial aggregation usually
  * suffices; salting matters when the DISTINCT-group state itself is the
  * bottleneck, or under exact per-group operations that resist map-side
  * combine.)
  */
object Skew {

  /** Deterministic salt from the full row content (no rand(): results and
    * plans stay reproducible run-to-run).
    */
  private def saltCol(df: DataFrame, buckets: Int): Column =
    pmod(xxhash64(df.columns.map(col): _*), lit(buckets.toLong))

  /** Two-phase salted sum: exactly `df.groupBy(keys).agg(sum(value))` but
    * with the per-key work spread across `saltBuckets` partial groups.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], value: String,
                saltBuckets: Int, resultName: String): DataFrame = {
    val partial = df
      .withColumn("_salt", saltCol(df, saltBuckets))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(sum(col(value)).as("_partial"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as(resultName))
  }
}
