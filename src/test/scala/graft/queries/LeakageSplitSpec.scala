package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins t24's one non-negotiable invariant — the split is CLUSTER-atomic:
  * no near-dup pair (d9's edge list, the thing the split exists to keep
  * intact) may straddle train/eval — plus the sane-fraction sanity check.
  * Value-level equality with the oracle is the gate's job; these hold for
  * ANY corpus, which the oracle can't express.
  */
class LeakageSplitSpec extends SparkTestBase {

  private lazy val dir = testData("0.001")

  test("t24: every near-dup cluster lands wholly in one split") {
    val split = Sampling.leakageSplit(spark, dir)
    // distinct splits per group_id must be exactly 1
    val mixedGroups = split.groupBy("group_id")
      .agg(countDistinct("split").as("n"))
      .filter(col("n") > 1)
      .count()
    assert(mixedGroups === 0L, "a group with both splits leaks by definition")
    // stronger: check against the raw d9 labels (same-cluster docs agree),
    // not just the group column t24 itself derived
    val labeled = split.join(
      Dedup.dupClusters(spark, dir).withColumnRenamed("cluster_id", "cid"),
      Seq("doc_id"))
    val mixedClusters = labeled.groupBy("cid")
      .agg(countDistinct("split").as("n")).filter(col("n") > 1).count()
    assert(mixedClusters === 0L)
  }

  test("t24: split covers every doc exactly once, train fraction sane") {
    val split = Sampling.leakageSplit(spark, dir).cache()
    try {
      val total = split.count()
      val docs = graft.core.Tables(spark, dir).documents.count()
      assert(total === docs, "one row per document")
      assert(split.select("doc_id").distinct().count() === total)
      val train = split.filter(col("split") === "train").count()
      // hash-balanced 8/10 target; the fixture is small, so loose bounds
      val frac = train.toDouble / total
      assert(frac > 0.6 && frac < 0.95, s"train fraction $frac implausible")
    } finally split.unpersist()
  }
}
