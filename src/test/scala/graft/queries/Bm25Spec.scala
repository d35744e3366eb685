package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Tables

/** Pins t19's BM25 semantics beyond the cross-engine oracle (which proves
  * Spark == DuckDB, not that either implements BM25): re-computes the
  * registered query's scores on the real fixture with a from-scratch Scala
  * BM25 over collected rows and requires exact agreement at the rounding
  * the query ships. A formula slip that both SQL dialects would mirror
  * (wrong idf variant, missing length normalization) fails here.
  */
class Bm25Spec extends SparkTestBase {

  private lazy val SfDir = testData("0.001")

  test("t19 matches a from-scratch BM25 over the collected fixture") {
    val docs = Tables(spark, SfDir).documents
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val n = docs.length.toLong
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / n
    val (k1, b) = (TextAnalysis.Bm25K1, TextAnalysis.Bm25B)

    def score(qTerms: Seq[String]): Map[Long, Double] = {
      val df = qTerms.map { t =>
        t -> docs.count(_._2.contains(t)).toLong
      }.toMap
      docs.flatMap { case (id, toks) =>
        val dl = toks.length.toLong
        val s = qTerms.map { t =>
          val tf = toks.count(_ == t).toLong
          if (tf == 0 || df(t) == 0) 0.0
          else {
            val idf = math.log(1.0 + (n.toDouble - df(t) + 0.5) / (df(t) + 0.5))
            idf * tf * (k1 + 1) / (tf + (dl / avgdl * b + (1 - b)) * k1)
          }
        }.sum
        if (s > 0) Some(id -> s) else None
      }.toMap
    }

    val got = TextAnalysis.bm25Search(spark, SfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty && got.length <= 3 * TextAnalysis.Bm25TopK)

    TextAnalysis.Bm25Queries.foreach { case (qid, terms) =>
      val want = score(terms).toSeq
        .map { case (id, s) =>
          (id, BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        .sortBy { case (id, s) => (-s, id) }
        .take(TextAnalysis.Bm25TopK)
        .zipWithIndex
        .map { case ((id, s), i) => (qid, i + 1, id, s) }
      val gotQ = got.filter(_._1 == qid).toSeq.sortBy(_._2)
      assert(gotQ === want, s"query $qid diverged from reference BM25")
    }
  }
}
