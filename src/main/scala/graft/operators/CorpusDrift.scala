package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution DRIFT between two corpus snapshots — the data-quality
  * monitor a production pipeline runs on every release next to x5's
  * row-level diff: per monitored dimension (language mix, source mix,
  * length histogram, ...), the old and new per-value counts side by side.
  * Release gates alert on the deltas (a source silently doubling, a
  * language vanishing, a length distribution collapsing) long before any
  * downstream training signal could.
  *
  * Scale shape: each side is ONE scan — the dimensions are exploded
  * in-row as (dim, value) pairs, so d dimensions cost d narrow rows per
  * doc, not d scans — into a hash aggregate whose map side collapses to
  * per-partition distinct (dim, value) keys (bounded by the dimensions'
  * value domains, not the corpus). The two count tables (dimension-sized,
  * tiny) meet in one full-outer join. Text never moves.
  */
object CorpusDrift {

  /** Per-(dim, value) counts of one snapshot; `dims` maps a dimension
    * name to the column expression that computes its value (any type —
    * values are cast to string so every dimension shares one schema).
    * Public because the streaming drift monitor (st14) runs THIS stage as
    * a streaming aggregation — the in-row dim explode and the count are
    * mode-agnostic.
    */
  def dimCounts(snapshot: DataFrame,
      dims: Seq[(String, Column)]): DataFrame = {
    val pairs = array(dims.map { case (name, c) =>
      struct(lit(name).as("dim"), c.cast("string").as("value"))
    }: _*)
    snapshot
      .select(explode(pairs).as("p"))
      .select(col("p.dim").as("dim"), col("p.value").as("value"))
      .groupBy("dim", "value")
      .agg(count(lit(1)).as("n"))
  }

  /** Drift report: (dim, value, old_n, new_n) with absent values counted
    * as 0 on their side — every row where the two snapshots disagree in
    * ANY monitored dimension value, plus the agreeing ones (callers
    * filter `old_n <> new_n` for an alert feed; the full table is the
    * auditable report).
    */
  def report(oldSnapshot: DataFrame, newSnapshot: DataFrame,
      dims: Seq[(String, Column)]): DataFrame = {
    // NULL-SAFE value equality: a dimension value that is NULL in both
    // snapshots (null lang, null text making len_x100 null) must count as
    // the SAME value — plain equi-join split it into a (old_n, 0) and a
    // (0, new_n) row, manufacturing a vanish+appear alert pair for a
    // dimension that did not drift. dim itself is a literal, never null.
    val o = dimCounts(oldSnapshot, dims).withColumnRenamed("n", "old_n")
      .alias("__o")
    val nw = dimCounts(newSnapshot, dims).withColumnRenamed("n", "new_n")
      .alias("__n")
    o.join(nw,
        col("__o.dim") === col("__n.dim") &&
          col("__o.value") <=> col("__n.value"), "full_outer")
      .select(
        coalesce(col("__o.dim"), col("__n.dim")).as("dim"),
        coalesce(col("__o.value"), col("__n.value")).as("value"),
        coalesce(col("old_n"), lit(0L)).as("old_n"),
        coalesce(col("new_n"), lit(0L)).as("new_n"))
  }
}
