package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Reusable cosine similarity-search OPERATORS over any (id, v) vector
  * frames — the generic forms of the n1/n2 query shapes
  * (graft.queries.Similarity binds them to the embeddings table), rounding
  * out the operator tier next to [[TemporalJoins]] and [[TextDedup]].
  *
  * Both expect frames with columns `id` (numeric) and `v`
  * (array<double>); [[cosineTopKBucketed]] additionally expects a
  * `bucket` column on both sides (any equi-joinable type — hyperplane
  * LSH sign-buckets via graft.functions.VectorLsh, IVF cell ids, or a
  * caller's own partitioner). Dot products run through the codegen'd
  * `graft_dot` expression; scores round to 4 decimals and rank with an
  * id tie-break, so ranking never hinges on sub-ulp float noise.
  */
object VectorSearch {

  private def prep(df: DataFrame, idAs: String, vAs: String,
      nAs: String): DataFrame = {
    VectorOps.register(df.sparkSession)
    df.withColumnRenamed("id", idAs)
      .withColumnRenamed("v", vAs)
      .withColumn(nAs, sqrt(expr(s"graft_dot($vAs, $vAs)")))
  }

  private def rank(scored: DataFrame, k: Int, extra: Seq[String]): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(("query_id" +: extra) ++ Seq("rank", "neighbor_id", "cos") map col: _*)
  }

  /** EXACT cosine top-k: every corpus vector scored for every query
    * (self-pairs excluded by id). The query side broadcasts — correct for
    * the bounded-|Q| "probe a corpus" shape; the corpus side only scans.
    * This is the O(|Q|·n) baseline the bucketed variant is measured
    * against (AnnRecallSpec); at corpus scale use [[cosineTopKBucketed]].
    */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = prep(queries, "query_id", "v1", "n1")
    val c = prep(corpus, "neighbor_id", "v2", "n2")
    val scored = broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        round(expr("graft_dot(v1, v2)") / (col("n1") * col("n2")), 4))
    rank(scored, k, Nil)
  }

  /** Bucketed ANN top-k: candidates restrict to the query's bucket, then
    * rank by exact cosine — the equi-join plan that survives a 100x
    * corpus (the quadratic work only happens within buckets). Recall is
    * the bucketing's dial, not the ranking's: results are exact within
    * the candidate set.
    */
  def cosineTopKBucketed(queries: DataFrame, corpus: DataFrame,
      k: Int): DataFrame = {
    val q = prep(queries, "query_id", "v1", "n1")
    val c = prep(corpus, "neighbor_id", "v2", "n2")
    val scored = broadcast(q).join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        round(expr("graft_dot(v1, v2)") / (col("n1") * col("n2")), 4))
    rank(scored, k, Seq("bucket"))
  }
}
