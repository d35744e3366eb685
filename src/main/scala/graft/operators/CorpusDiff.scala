package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot corpus DIFF — the dataset-versioning operator a
  * training pipeline runs between two releases of a zone: which documents
  * were added, removed, or modified (same id, different content). The diff
  * is what release notes, incremental re-training decisions, and targeted
  * re-export (ExportJob's changed-shards mode) consume.
  *
  * Scale shape: both sides reduce to (doc_id, content-digest) IN THE SCAN
  * (`md5` over the text — 16 bytes regardless of document size), so the
  * full-outer join shuffles two narrow id→digest frames and the text
  * itself never moves. Output carries only CHANGED rows — `unchanged` (the
  * overwhelming majority between adjacent snapshots) is filtered before
  * anything is returned, so the result is diff-sized, not corpus-sized.
  * One shuffle per side, join on the id both sides are naturally keyed by.
  */
object CorpusDiff {

  /** Null-safe content digest. A bare `md5(NULL)` is NULL, which the join
    * below cannot tell apart from "row absent on this side" — a null-text
    * doc present in both snapshots would misclassify as `added`. Coalesce
    * to a sentinel outside the normal text space (a NUL byte never appears
    * in cleaned corpus text) so null text digests like any other content:
    * same-null on both sides → unchanged, null↔text → modified. Shared
    * with the streaming CDC twin so batch diff and arrival-driven CDC
    * agree on every document.
    */
  def contentDigest(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    md5(coalesce(text, lit("\u0000")))

  /** Diff two (doc_id, text) frames. Returns (doc_id, status) with status
    * in {added, removed, modified}, one row per changed id.
    */
  def diff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    val o = oldDocs.select(col("doc_id"), contentDigest(col("text")).as("old_md5"))
    val n = newDocs.select(col("doc_id"), contentDigest(col("text")).as("new_md5"))
    o.join(n, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("old_md5").isNull, "added")
          .when(col("new_md5").isNull, "removed")
          .when(col("old_md5") =!= col("new_md5"), "modified"))
      .filter(col("status").isNotNull)
      .select("doc_id", "status")
  }
}
