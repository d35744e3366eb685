package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase
import graft.operators.TextDedup
import graft.queries.EventStreaming

/** st9 streaming near-dup detection under deterministic multi-batch
  * replay: the per-arrival band-ledger verdicts must collapse to exactly
  * the batch d12 result on the same corpus, with duplicates flagged ACROSS
  * the batch boundary (the ledger state carrying), Append-mode
  * exactly-once emission, and the two signature paths (in-row fold vs
  * explode+aggregate) bit-identical.
  */
class StreamingNearDupSpec extends SparkTestBase {

  private val SfDir = "/root/testdata/sf0.001"

  private def docs: DataFrame =
    spark.read.parquet(s"$SfDir/documents.parquet") // 500 docs

  test("native in-row band hashes equal the explode+aggregate batch path") {
    val agg = TextDedup.minhashBandsAgg(docs).orderBy("doc_id", "band").collect()
    val inRow = TextDedup.minhashBandsInRow(docs).orderBy("doc_id", "band").collect()
    assert(agg.toSeq == inRow.toSeq)
    assert(agg.length == docs.count() * TextDedup.Bands)
  }

  test("replayed verdicts equal batch d12, dups flagged across batches, append exactly-once") {
    val dir = scratch("near_dup_replay")
    val T0 = 1700000000000L
    val base = docs.filter(col("doc_id") < 40)
    val fresh = docs.filter(col("doc_id").between(40, 49))
    // exact copies of docs 0-9 under new ids — all 4 bands collide with
    // their originals, which arrive one batch EARLIER (ledger must carry)
    val dups = docs.filter(col("doc_id") < 10)
      .withColumn("doc_id", col("doc_id") + 100000L)
    ReplayFixtures.writeOne(base, s"$dir/f0.parquet", T0)
    ReplayFixtures.writeOne(dups.unionByName(fresh), s"$dir/f1.parquet", T0 + 60000L)

    val corpus = base.unionByName(dups).unionByName(fresh)
    val expected = TextDedup.nearDupVerdicts(corpus)
      .withColumn("is_near_dup", col("is_near_dup").cast("int"))
      .orderBy("doc_id").collect()

    val hits = EventStreams.replayToTable(
      DocumentStreams.nearDupBandHits(
        DocumentStreams.readDocuments(spark, dir, glob = "*.parquet",
          maxFilesPerTrigger = Some(1))).toDF(),
      "st9_spec_mem", OutputMode.Append())
    val got = EventStreaming.collapseNearDup(hits).collect()
    assert(got.toSeq == expected.toSeq)

    // exact copies arriving after their originals: all 4 bands hit
    val dupRows = got.filter(_.getLong(0) >= 100000L)
    assert(dupRows.length == 10)
    assert(dupRows.forall(r => r.getInt(1) == 1 && r.getLong(2) == 4L))

    // append exactly-once: one sink row per (doc, band)
    assert(hits.count() == corpus.count() * TextDedup.Bands)
    assert(hits.groupBy("doc_id", "band").count().filter(col("count") > 1).isEmpty)
  }
}
