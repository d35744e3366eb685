package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy entity matching (entity resolution): find pairs of
  * DISTINCT attribute values that are within a small edit distance —
  * "cold anvil" / "old anvil" — i.e. merge candidates a curation pipeline
  * would reconcile before deduplication or aggregation keyed on the value.
  *
  * Scale shape (the reason this is not one self-join over the raw table):
  *  1. rows collapse to DISTINCT values first — one hash aggregate that
  *     also carries a canonical id (min id) and the support count. At
  *     100 TB the distinct-value table is orders of magnitude smaller
  *     than the row count (values repeat; Heaps-style growth), and every
  *     later stage works on it, never on the rows;
  *  2. candidate generation is a BLOCKED self-equi-join: values pair only
  *     within a user-chosen blocking key (here: a token that survives the
  *     typo class being hunted). Never all-pairs — the join Spark plans
  *     is a plain hash join on the block key, AQE-skew-splittable;
  *  3. blocks larger than `maxBlockSize` distinct values are dropped
  *     whole (the d5 gram-df-guard move): an oversized block means the
  *     key does not discriminate, its pairs are noise, and its b² cost is
  *     exactly the blow-up the guard exists to bound. The guard join is a
  *     broadcast of the tiny per-block count frame;
  *  4. the pair predicate is band-limited `levenshtein(a, b, maxDist)` —
  *     O(maxDist·len) per pair, not full DP — and `a < b` halves the
  *     matrix and canonicalizes pair order.
  *
  * Output: one row per matched unordered pair — both values, their
  * canonical ids, support counts, and the edit distance.
  */
object EntityResolution {

  def fuzzyMatches(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      blockOf: Column => Column,
      maxDist: Int,
      maxBlockSize: Int = 1000): DataFrame = {
    require(maxDist > 0, "maxDist must be positive")
    val names = df
      .groupBy(col(valueCol).as("value"))
      .agg(min(col(idCol)).as("canon_id"), count(lit(1)).as("n_rows"))
      .withColumn("block", blockOf(col("value")))
    // the small-blocks frame is |distinct blocks|-sized — it GROWS with
    // the entity population, so the broadcast choice is AQE's (a forced
    // hint would bypass the size threshold and abort at corpus scale)
    val sized = names.join(
      names.groupBy("block").agg(count(lit(1)).as("block_n"))
        .filter(col("block_n") <= maxBlockSize).select("block"),
      "block")
    val a = sized.select(col("block"), col("value").as("value_a"),
      col("canon_id").as("canon_id_a"), col("n_rows").as("n_rows_a"))
    val b = sized.select(col("block"), col("value").as("value_b"),
      col("canon_id").as("canon_id_b"), col("n_rows").as("n_rows_b"))
    a.join(b, Seq("block"))
      .filter(col("value_a") < col("value_b"))
      // threshold form returns -1 past the band — cheaper than full DP
      .withColumn("dist", levenshtein(col("value_a"), col("value_b"), maxDist))
      .filter(col("dist") >= 0)
      .select("value_a", "value_b", "dist",
        "canon_id_a", "canon_id_b", "n_rows_a", "n_rows_b")
  }
}
