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

  /** Salt from the row's position, not its content: identical rows (the
    * canonical hot-key-with-constant-payload case) must still spread across
    * buckets, which a content hash cannot do. monotonically_increasing_id
    * is partition-position derived — no rand(), and the aggregate result is
    * salt-invariant regardless.
    */
  private def saltCol(buckets: Int): Column =
    pmod(monotonically_increasing_id(), lit(buckets.toLong))

  /** Two-phase salted sum: exactly `df.groupBy(keys).agg(sum(value))` but
    * with the per-key work spread across `saltBuckets` partial groups.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], value: String,
                saltBuckets: Int, resultName: String): DataFrame = {
    // withColumn REPLACES a same-named column silently: a user column named
    // _salt would be overwritten by the synthetic salt (sums of salt values
    // returned as data, no error), and _partial would collide in phase two
    for (reserved <- Seq("_salt", "_partial"))
      require(!df.columns.contains(reserved),
        s"saltedSum reserves the column name '$reserved'; rename it upstream")
    val partial = df
      .withColumn("_salt", saltCol(saltBuckets))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(sum(col(value)).as("_partial"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as(resultName))
  }
}
