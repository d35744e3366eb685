package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion of heterogeneous ranked retrieval lists —
  * the standard way a hybrid search stack combines a lexical (BM25) and a
  * dense (embedding cosine) leg without calibrating their incomparable
  * score scales (Cormack/Clarke/Buettcher, SIGIR'09: RRF outperforms
  * learned fusion on TREC runs with the single constant c=60).
  *
  * Contract: every input frame carries (query_id, doc_id, rank) with rank
  * 1-based within query_id. Fused score for a doc is Σ_lists 1/(c + rank);
  * a doc absent from a list simply contributes nothing for that list.
  *
  * DETERMINISM: the reciprocal is computed in integer fixed-point —
  * `Scale / (c + rank)` with BIGINT division, summed as a BIGINT — not as
  * a float sum. A float Σ 1/(c+r) depends on addition order, which a
  * distributed aggregate does not pin; the integer form is
  * order-independent and exact, so Spark and a SQL oracle agree
  * bit-for-bit (same trick as the quantizer's fixed-point centroid means,
  * `functions/CentroidOps.scala`). At 1e9 scale the quantization error
  * (< 1e-9 per term) is far below the 1/(c+r) gaps RRF ranks by; ties that
  * genuinely remain (same list memberships at the same ranks) break by
  * doc_id.
  *
  * Scale shape: inputs are per-query top-k lists, so the fused frame holds
  * ≤ |Q|·k·lists rows — the union + one aggregate + one window all run on
  * a frame bounded by the REPORT size, not the corpus. The heavy lifting
  * (scanning the corpus) already happened inside each retrieval leg; fusion
  * adds one shuffle of report-sized data.
  */
object RankFusion {

  /** Fixed-point scale for the reciprocal: 1e9 keeps every quotient
    * exactly representable and sums for thousands of lists well inside
    * BIGINT range.
    */
  val Scale = 1000000000L

  /** SQL fragment computing one list's fused contribution for a rank
    * column — kept here so oracle SQL and the Spark plan share one
    * definition of the fixed-point reciprocal.
    */
  def termSql(c: Int, rankCol: String): String =
    s"$Scale // ($c + $rankCol)" // DuckDB integer division

  def rrf(lists: Seq[DataFrame], c: Int, topK: Int): DataFrame = {
    require(lists.nonEmpty, "rrf needs at least one ranked list")
    val contrib = lists
      .map(_.select(col("query_id"), col("doc_id"),
        expr(s"${Scale}L DIV ($c + rank)").as("term")))
      .reduce(_ unionAll _)
    val fused = contrib
      .groupBy("query_id", "doc_id")
      .agg(sum("term").as("rrf_e9"))
    val w = Window.partitionBy("query_id").orderBy(desc("rrf_e9"), asc("doc_id"))
    fused
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select("query_id", "rank", "doc_id", "rrf_e9")
  }
}
