package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TopKAgg

/** Grouping-key skew profile over ANY frame — the reusable pre-join /
  * pre-aggregate diagnostic (pr2 is this operator bound to `events`'
  * candidate keys): for each declared candidate shuffle key, the per-key
  * count distribution a partitioner would see — row/key totals, the
  * hottest key's share, the top-N keys' combined share, and the max/avg
  * skew ratio. A large skew_ratio is exactly the shape that stalls a
  * shuffle stage on one reducer; Sketches.saltedRollup is the remedy this
  * report dispatches to, AQE skew-join the runtime backstop, z4's
  * Misra–Gries heavy hitters the streaming estimate of the same quantity.
  *
  * Scale shape (unchanged from pr2's inline original): ALL candidate keys
  * profile off ONE scan — each row stacks into one (key_col, value) pair
  * per candidate, so k keys cost one pass over the table, not k (at
  * 100 TB the scan IS the bill). Then one shuffle of map-side-combined
  * (key_col, value) counts, and a per-key_col aggregate over the
  * |keys|-sized count table in which the top-N runs through the native
  * graft_topk heap (≤ N pairs per input partition cross the exchange —
  * no |keys| sort anywhere). All shares derive from exact integer counts
  * — the top-N SUM is tie-order-independent because tied keys contribute
  * the same count — so cross-engine parity is exact before the final
  * rounding. SkewProfileSpec pins the one-scan/heap/no-window plan at
  * ≥ 3 keys.
  */
object SkewProfile {

  /** The skew report: one row per candidate key —
    * (key_col, n_rows, n_keys, max_cnt, top1_share, top{topN}_share,
    * skew_ratio), ordered by key_col. NULL key values are excluded (a
    * null never routes to a hot reducer — nullability is DataChecks'
    * business).
    */
  def report(df: DataFrame, keys: Seq[String], topN: Int = 10): DataFrame = {
    require(keys.nonEmpty, "no candidate keys declared")
    require(topN > 0, s"topN must be positive, got $topN")
    // candidate keys resolve to the frame's own spelling under the
    // SESSION'S resolver — case-insensitively by default (a caller
    // passing USER_ID against user_id profiles the column Spark itself
    // would resolve), exact under spark.sql.caseSensitive=true — and a
    // key several columns answer fails loud HERE, with the operator's
    // message, instead of as an AMBIGUOUS_REFERENCE from deep inside
    // analysis of the generated SQL; the canonical spelling is what the
    // SQL quotes and what key_col reports
    val caseSensitive =
      df.sparkSession.sessionState.conf.caseSensitiveAnalysis
    val resolved = keys.map { k =>
      // key names are embedded in the generated stack() SQL: identifiers
      // ride backtick quoting, literals ride backslash-doubling then
      // single-quote doubling (the parser escape-processes literals by
      // default, so a lone backslash would mangle the key_col value) — a
      // backtick in the name itself has no escape, so reject it
      require(!k.contains("`"),
        s"candidate key '$k' contains a backtick")
      val hits =
        if (caseSensitive) df.columns.filter(_ == k)
        else df.columns.filter(_.equalsIgnoreCase(k))
      require(hits.nonEmpty,
        s"candidate key '$k' is not a column of the frame " +
          s"(columns: ${df.columns.mkString(", ")})")
      require(hits.length == 1,
        s"candidate key '$k' is ambiguous under the session's resolver " +
          s"(matches: ${hits.mkString(", ")})")
      hits.head
    }
    require(resolved.distinct.size == resolved.size,
      // name the resolution mode that actually ran — under
      // caseSensitive=true resolution was exact, and claiming
      // "case-insensitive" there would misdirect the debugging
      s"duplicate candidate keys (after ${
        if (caseSensitive) "exact" else "case-insensitive"
      } resolution): " +
        resolved.diff(resolved.distinct).distinct.mkString(", "))
    val stackArgs = resolved
      .map(k => s"'${k.replace("\\", "\\\\").replace("'", "''")}', " +
        s"CAST(`$k` AS STRING)")
      .mkString(",\n")
    val shim = org.apache.spark.sql.graft.ColumnShim
    val keyed = df.select(expr(
      s"stack(${keys.size},\n$stackArgs\n) AS (key_col, k)"))
      .filter(col("k").isNotNull)
    val counts = keyed.groupBy("key_col", "k").agg(count(lit(1)).as("cnt"))
    // counts are exact integers far below 2^53, so the double scores
    // ARE the counts; the heap id is a deterministic key hash (ids only
    // break ties, and tied entries carry equal counts either way)
    val tk = shim.column(TopKAgg(topN,
      shim.expression(col("cnt").cast("double")),
      shim.expression(xxhash64(col("k")))).toAggregateExpression())
    counts.groupBy("key_col")
      .agg(
        sum("cnt").as("n_rows"),
        count(lit(1)).as("n_keys"),
        max("cnt").as("max_cnt"),
        tk.as("top"))
      .select(
        col("key_col"),
        col("n_rows"),
        col("n_keys"),
        col("max_cnt"),
        round(col("max_cnt").cast("double") / col("n_rows"), 6).as("top1_share"),
        round(expr("aggregate(top, CAST(0.0 AS DOUBLE), (a, x) -> a + x.score)") /
          col("n_rows").cast("double"), 6).as(s"top${topN}_share"),
        round(col("max_cnt").cast("double") /
          (col("n_rows").cast("double") / col("n_keys")), 6).as("skew_ratio"))
      .orderBy("key_col")
  }
}
