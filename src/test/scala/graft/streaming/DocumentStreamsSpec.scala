package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase
import graft.queries.EventStreaming

/** Streaming exact dedup (st6) under the conditions the single-file oracle
  * replay never exercises: a 3-file zone with the SAME texts recurring in
  * later files under fresh doc_ids, replayed one file per micro-batch — the
  * digest state must absorb each batch incrementally and the collapsed
  * update log must equal the batch ledger over the whole zone.
  */
class DocumentStreamsSpec extends SparkTestBase {

  private lazy val SfDir = testData("0.001")

  private def writeOne(df: DataFrame, dst: String, mtime: Long): Unit =
    ReplayFixtures.writeOne(df, dst, mtime)

  test("streaming dedup ledger equals batch dedup over a 3-file replay with cross-file duplicates") {
    val dir = scratch("docstream_dedup")
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
    // every 25th text recurs in files 2 and 3 under fresh doc_ids, so its
    // digest group is touched by up to three different micro-batches
    val dupes = docs.filter(col("doc_id") % 25 === 0)
    def shifted(by: Long) = dupes.withColumn("doc_id", col("doc_id") + by)
    val t0 = 1700000000000L
    writeOne(docs.filter(pmod(col("doc_id"), lit(3)) === 0),
      s"$dir/f0.parquet", t0)
    writeOne(docs.filter(pmod(col("doc_id"), lit(3)) === 1)
      .unionByName(shifted(100000L)), s"$dir/f1.parquet", t0 + 60000L)
    writeOne(docs.filter(pmod(col("doc_id"), lit(3)) === 2)
      .unionByName(shifted(200000L)), s"$dir/f2.parquet", t0 + 120000L)

    val updates = EventStreams.replayToTable(
      DocumentStreams.dedupGroups(DocumentStreams.readDocuments(
        spark, dir, glob = "*.parquet", maxFilesPerTrigger = Some(1))),
      "docstream_dedup_t", OutputMode.Update())
    // the cross-batch path was really taken: some digest emitted updates
    // from more than one micro-batch
    val maxUpdates = updates.groupBy("text_md5").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxUpdates > 1)

    val got = EventStreaming.collapseDedup(updates).collect().toSeq
    val want = spark.read.parquet(dir)
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_doc_id").collect().toSeq
    assert(got.size === want.size)
    got.zip(want).foreach { case (a, b) => assert(a === b) }
    // keep-first survived disorder: the duplicated texts kept their
    // ORIGINAL ids and counted all three copies
    val dupeRows = EventStreaming.collapseDedup(updates)
      .filter(col("n_copies") === 3).collect()
    assert(dupeRows.nonEmpty)
    assert(dupeRows.forall(_.getLong(1) < 100000L))
  }

  test("streaming chunker equals batch chunking over a 3-file replay (st7)") {
    val dir = scratch("docstream_chunks")
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
    val t0 = 1700000000000L
    (0 to 2).foreach { i =>
      writeOne(docs.filter(pmod(col("doc_id"), lit(3)) === i),
        s"$dir/f$i.parquet", t0 + i * 60000L)
    }
    val streamed = EventStreams.replayToTable(
      graft.queries.Sampling.chunkTokens(DocumentStreams.readDocuments(
        spark, dir, glob = "*.parquet", maxFilesPerTrigger = Some(1))),
      "docstream_chunks_t", OutputMode.Append())
      .orderBy("doc_id", "chunk_id").collect().toSeq
    val batch = graft.queries.Sampling.chunkTokens(spark.read.parquet(dir))
      .orderBy("doc_id", "chunk_id").collect().toSeq
    assert(streamed.size === batch.size)
    streamed.zip(batch).foreach { case (a, b) => assert(a === b) }
  }

  test("streaming heavy hitters equals batch z4 over a 3-file replay (st8)") {
    val dir = scratch("docstream_hh")
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
    val t0 = 1700000000000L
    (0 to 2).foreach { i =>
      writeOne(docs.filter(pmod(col("doc_id"), lit(3)) === i),
        s"$dir/f$i.parquet", t0 + i * 60000L)
    }
    val updates = EventStreams.replayToTable(
      DocumentStreams.tokenCounts(DocumentStreams.readDocuments(
        spark, dir, glob = "*.parquet", maxFilesPerTrigger = Some(1))),
      "docstream_hh_t", OutputMode.Update())
    // the ledger really accumulated across batches: common tokens emitted
    // refreshed counts from more than one micro-batch
    val maxUpdates = updates.groupBy("token").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxUpdates > 1, "expected cross-batch count updates")

    val got = EventStreaming.collapseHeavyHitters(updates).collect().toSeq
    val want = graft.queries.Sketches
      .heavyHittersOf(spark.read.parquet(dir), graft.queries.Sketches.HhK)
      .collect().toSeq
    assert(got.nonEmpty && got.size === want.size)
    got.zip(want).foreach { case (a, b) => assert(a === b) }
  }

  test("null ingest clocks drop at entry of the watermarked document operators") {
    import java.sql.Timestamp
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val nullTs: Timestamp = null
    val t0 = Timestamp.valueOf("2026-01-01 10:00:00")

    // bounded dedup: a null-clock row neither emits nor occupies state
    val dd = MemoryStream[(Long, String, Timestamp)]
    val ddQ = DocumentStreams.dedupWithinWatermark(
      dd.toDF().toDF("doc_id", "text", "event_ts"), "10 minutes")
      .writeStream.queryName("nullclock_dd")
      .outputMode(OutputMode.Append()).format("memory").start()
    try {
      dd.addData((1L, "alpha", t0), (2L, "beta", nullTs), (3L, "alpha", t0))
      ddQ.processAllAvailable()
      val kept = spark.table("nullclock_dd").select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(kept === Set(1L), s"wrong survivors: $kept")
    } finally ddQ.stop()

    // TTL CDC: the null-clock arrival is dropped (it used to NPE arming
    // the eviction clock); clocked arrivals still classify
    val cdc = MemoryStream[(Long, String, Timestamp)]
    val old = Seq((1L, "old text")).toDF("doc_id", "text")
    val cdcQ = DocumentStreams.cdcVerdictsWithTtl(
      cdc.toDF().toDF("doc_id", "text", "event_ts"), old, ttlMs = 3600000L)
      .toDF()
      .writeStream.queryName("nullclock_cdc")
      .outputMode(OutputMode.Append()).format("memory").start()
    try {
      cdc.addData((1L, "new text", t0), (2L, "added doc", nullTs))
      cdcQ.processAllAvailable()
      val verdicts = spark.table("nullclock_cdc").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(verdicts === Map(1L -> "modified"), s"wrong verdicts: $verdicts")
    } finally cdcQ.stop()

    // bounded near-dup: the null-clock doc is not flagged and does not
    // seed buckets (it used to NPE in the event-time sort)
    val nd = MemoryStream[(Long, String, Timestamp)]
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val ndQ = DocumentStreams.nearDupBandHitsWithinWatermark(
      nd.toDF().toDF("doc_id", "text", "event_ts"), horizonMs = 3600000L)
      .toDF()
      .writeStream.queryName("nullclock_nd")
      .outputMode(OutputMode.Append()).format("memory").start()
    try {
      nd.addData((1L, text, nullTs), (2L, text, t0),
        (3L, text, new Timestamp(t0.getTime + 1000)))
      ndQ.processAllAvailable()
      val hits = spark.table("nullclock_nd").groupBy("doc_id")
        .agg(max(col("hit").cast("int")).as("h")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      // doc 1 never appears (dropped); doc 2 seeds; doc 3 hits doc 2
      assert(hits === Map(2L -> 0, 3L -> 1), s"wrong hits: $hits")
    } finally ndQ.stop()
  }
}
