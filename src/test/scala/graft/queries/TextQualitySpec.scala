package graft.queries

import graft.SparkTestBase

/** Semantics tests for the LM-quality scoring tier (t16): the score is
  * re-derived driver-side from first principles — same definition, separate
  * arithmetic path — so a formulation change that drifts from "unigram
  * negative log-likelihood per token" fails here even if the SQL oracle is
  * changed in lockstep.
  */
class TextQualitySpec extends SparkTestBase {

  private lazy val Sf = testData("0.001")

  test("unigram perplexity matches the per-doc NLL definition (t16)") {
    val docs = graft.core.Tables(spark, Sf).documents
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" ", -1))
    val counts = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong)
    val total = counts.values.sum.toDouble
    val expected = docs.map { case (id, toks) =>
      val nll = toks.map(w => math.log(total) - math.log(counts(w).toDouble)).sum / toks.length
      id -> BigDecimal(math.exp(nll)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = TextAnalysis.unigramPpl(spark, Sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("ppl"),
        r.getAs[Boolean]("flagged")))
    assert(got.length === expected.size)
    // float-sum association differs between the two paths; 4-decimal
    // rounding can land a half-ulp apart, so compare at 1e-3
    got.foreach { case (id, ppl, _) =>
      assert(math.abs(ppl - expected(id)) < 1e-3, s"doc $id: $ppl vs ${expected(id)}")
    }
    // the flag is corpus-relative: exactly the docs above cap*mean(ppl)
    val mean = got.map(_._2).sum / got.length
    got.foreach { case (id, ppl, flagged) =>
      val expect = ppl > TextAnalysis.PplCapFactor * mean
      // tolerate the rounding boundary itself
      if (math.abs(ppl - TextAnalysis.PplCapFactor * mean) > 1e-3)
        assert(flagged === expect, s"doc $id: flagged=$flagged ppl=$ppl mean=$mean")
    }
    // a doc built from the corpus's rarest tokens must out-perplex one
    // built from its most common tokens (the property the filter exists
    // for); proxy: max ppl strictly above min ppl, scores non-degenerate
    assert(got.map(_._2).distinct.length > 1, "scores are degenerate")
  }
}
