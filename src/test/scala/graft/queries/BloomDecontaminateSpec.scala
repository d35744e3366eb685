package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** d15's contract: the bloom is an OPTIMIZATION, never a semantics change.
  * Blooms admit false positives (removed by the exact verify join) and no
  * false negatives (so nothing is lost) — therefore the result must be
  * bit-identical to d8 at ANY fpp, including an absurdly lossy sketch. And
  * the prune must actually prune: at a sane fpp the surviving gram count
  * is a small fraction of the clean corpus.
  */
class BloomDecontaminateSpec extends SparkTestBase {

  private lazy val dir = testData("0.001")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.toString)

  test("equals d8 exactly at default, tight, and absurd fpp") {
    val exact = canon(Dedup.decontaminate(spark, dir))
    assert(exact.nonEmpty, "fixture must produce contaminated docs")
    Seq(0.3, 0.03, 0.001).foreach { fpp =>
      assert(canon(Dedup.bloomDecontaminate(spark, dir, fpp)) === exact,
        s"fpp=$fpp diverged from the exact result")
    }
  }

  test("the bloom prune removes most clean grams before the join") {
    val grams = Dedup.docGramHashes(spark, dir)
    val evalGrams = grams.filter(col("doc_id") % Dedup.EvalMod === 0)
      .select("h").distinct()
    val bf = evalGrams.stat.bloomFilter("h", evalGrams.count(), 0.01)
    val bfB = spark.sparkContext.broadcast(bf)
    val mightContain = udf((h: Long) => bfB.value.mightContainLong(h))
    val train = grams.filter(col("doc_id") % Dedup.EvalMod =!= 0)
    val total = train.count()
    val survive = train.filter(mightContain(col("h"))).count()
    assert(survive < total / 2,
      s"prune kept $survive of $total grams — the sketch isn't pruning")
  }
}
