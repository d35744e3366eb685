package graft.streaming

import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

/** Pins the streaming-CDC ledger semantics the st12 gate (single-batch
  * replay vs the x5 upserts oracle) cannot reach: cross-batch re-upserts
  * against the UPDATED ledger value, idempotent-redelivery silence, and
  * that an absent doc never emits. Multi-batch split forced by the
  * ReplayFixtures staggered-mtime protocol.
  */
class StreamingCdcSpec extends SparkTestBase {

  test("cdc: initial-state ledger, per-batch upsert verdicts, redelivery silence") {
    import spark.implicits._
    val zone = scratch("cdc-zone")
    val t0 = System.currentTimeMillis() - 60000
    // batch 1: A modified vs snapshot, B unchanged, C added
    ReplayFixtures.writeOne(
      Seq((1L, "v1"), (2L, "same"), (3L, "x")).toDF("doc_id", "text"),
      s"$zone/b1.parquet", t0)
    // batch 2: A modified AGAIN (vs the batch-1 ledger value), D added
    ReplayFixtures.writeOne(
      Seq((1L, "v2"), (4L, "new")).toDF("doc_id", "text"),
      s"$zone/b2.parquet", t0 + 2000)
    // batch 3: pure redelivery — must be silent
    ReplayFixtures.writeOne(
      Seq((1L, "v2"), (2L, "same")).toDF("doc_id", "text"),
      s"$zone/b3.parquet", t0 + 4000)

    // snapshot ledger: A at v0, B at same, E which never arrives
    val old = Seq((1L, "v0"), (2L, "same"), (9L, "gone"))
      .toDF("doc_id", "text")
    val stream = DocumentStreams.readDocuments(spark, zone,
      glob = "*.parquet", maxFilesPerTrigger = Some(1))
      .select("doc_id", "text")
    val got = EventStreams.replayToTable(
      DocumentStreams.cdcVerdicts(stream, old).toDF(),
      "cdc_spec_mem", OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getString(1)))

    val counts = got.groupBy(identity).view.mapValues(_.length).toMap
    assert(counts === Map(
      (1L, "modified") -> 2, // v0->v1 in batch 1, v1->v2 in batch 2
      (3L, "added") -> 1,
      (4L, "added") -> 1),
      s"got ${got.toSeq}")
    assert(!got.exists(_._1 == 2L), "unchanged doc must stay silent")
    assert(!got.exists(_._1 == 9L), "an absence must never emit (no tombstones)")
  }
}
