package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

/** The TTL-bounded CDC variant under deterministic multi-batch replay:
  * proves all three contract halves —
  *
  *  1. with ttl ≥ the replay horizon, verdicts equal the unbounded
  *     [[DocumentStreams.cdcVerdicts]] exactly (the bound is free until
  *     you actually exceed it);
  *  2. an entry refreshed by an arrival IS evicted once the watermark
  *     passes (event time + ttl), so a post-expiry re-arrival re-emits
  *     `added` — the cold-cache contract, same shape as BoundedDedupSpec's
  *     post-horizon re-crawl;
  *  3. SEEDED entries whose doc never arrived are NOT evicted — a late
  *     first arrival still classifies against the snapshot.
  *
  * Timeline (ttl = 2 h; watermark trails one batch, so eviction of a
  * batch's entries needs a later batch to advance it, then another for
  * the timeout sweep to run):
  *   f0 @ T0        docs 0-4 modified, 5-9 unchanged, 100 new
  *   f1 @ T0+4h     doc 200 new            -> advances watermark to T0
  *   f2 @ T0+4h10m  doc 300 new            -> watermark now T0+4h; f0's
  *                                            arrival entries (timeout
  *                                            ~T0+2h) evicted this batch
  *   f3 @ T0+4h20m  doc 0 re-arrives with the SAME modified text (entry
  *                  gone -> `added`); doc 10 arrives unchanged for the
  *                  first time (seed intact -> silence)
  */
class CdcTtlSpec extends SparkTestBase {

  private lazy val SfDir = testData("0.001")
  private val T0 = 1700000000000L
  private val Hour = 3600000L

  private def at(df: DataFrame, ts: Long): DataFrame =
    df.withColumn("event_ts", timestamp_millis(lit(ts)))

  private def writeZone(dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$SfDir/documents.parquet") // 50 docs
    val snapshot = docs.filter(col("doc_id") < 40).select("doc_id", "text")
    def doc(id: Long) = docs.filter(col("doc_id") === id)
    def fresh(src: Long, id: Long) = doc(src)
      .withColumn("doc_id", lit(id))
      .withColumn("text", concat(col("text"), lit(s" fresh $id")))
    val modified = docs.filter(col("doc_id") < 5)
      .withColumn("text", concat(col("text"), lit(" v2")))
    val unchanged = docs.filter(col("doc_id").between(5, 9))

    ReplayFixtures.writeOne(
      at(modified.unionByName(unchanged).unionByName(fresh(40, 100L)), T0),
      s"$dir/f0.parquet", T0)
    ReplayFixtures.writeOne(at(fresh(41, 200L), T0 + 4 * Hour),
      s"$dir/f1.parquet", T0 + 60000L)
    ReplayFixtures.writeOne(at(fresh(42, 300L), T0 + 4 * Hour + 600000L),
      s"$dir/f2.parquet", T0 + 120000L)
    val f3 = at(docs.filter(col("doc_id") === 0)
        .withColumn("text", concat(col("text"), lit(" v2"))), // same digest as f0's
        T0 + 4 * Hour + 1200000L)
      .unionByName(at(doc(10), T0 + 4 * Hour + 1200000L))
    ReplayFixtures.writeOne(f3, s"$dir/f3.parquet", T0 + 180000L)
    snapshot
  }

  private def runTtl(dir: String, snapshot: DataFrame, ttlMs: Long,
      name: String) = {
    val q = DocumentStreams.cdcVerdictsWithTtl(
      DocumentStreams.readDocumentsWithTs(
        spark, dir, glob = "*.parquet", maxFilesPerTrigger = Some(1))
        .select("doc_id", "text", "event_ts"),
      snapshot, ttlMs).toDF()
      .writeStream.queryName(name).outputMode("append")
      .format("memory").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q
  }

  test("short ttl evicts refreshed entries; seeds survive; long ttl matches unbounded") {
    val dir = scratch("cdc_ttl")
    val snapshot = writeZone(dir)

    val q = runTtl(dir, snapshot, 2 * Hour, "cdc_ttl_t")
    val out = spark.table("cdc_ttl_t")

    // f0 classified against intact seeds: 1-4 modified-only (doc 0 gains a
    // second, post-expiry row checked below), 5-9 silent, 100 added
    assert(out.filter(col("doc_id").between(1, 4)).select("status").distinct()
      .collect().map(_.getString(0)).toSeq == Seq("modified"))
    assert(out.filter(col("doc_id").between(1, 4)).count() === 4)
    assert(out.filter(col("doc_id").between(5, 9)).count() === 0)
    assert(out.filter(col("doc_id").isin(100L, 200L, 300L))
      .filter(col("status") === "added").count() === 3)
    // doc 0's refreshed entry expired -> its unchanged-content re-arrival
    // re-reads as `added` (one modified row from f0, one added row from f3)
    assert(out.filter(col("doc_id") === 0).count() === 2)
    assert(out.filter(col("doc_id") === 0)
      .filter(col("status") === "added").count() === 1)
    // doc 10's seed was NOT evicted: unchanged first arrival stays silent
    assert(out.filter(col("doc_id") === 10).count() === 0)
    // the state store really removed rows
    val removed = q.recentProgress.filter(_.stateOperators.nonEmpty)
      .map(_.stateOperators.head.numRowsRemoved).sum
    assert(removed > 0, s"expected evictions, removed=$removed")

    // ttl beyond the replay horizon: identical to the unbounded variant
    runTtl(dir, snapshot, 100 * Hour, "cdc_ttl_long_t")
    val qu = DocumentStreams.cdcVerdicts(
      DocumentStreams.readDocumentsWithTs(
        spark, dir, glob = "*.parquet", maxFilesPerTrigger = Some(1))
        .select("doc_id", "text"),
      snapshot).toDF()
      .writeStream.queryName("cdc_unbounded_t").outputMode("append")
      .format("memory").trigger(Trigger.AvailableNow()).start()
    qu.awaitTermination()
    val long = spark.table("cdc_ttl_long_t").collect().map(_.toSeq).toSet
    val unbounded = spark.table("cdc_unbounded_t").collect().map(_.toSeq).toSet
    assert(long == unbounded)
    // and the unbounded ledger keeps doc 0 silent at f3 (contrast with the
    // short-ttl `added` above)
    assert(spark.table("cdc_unbounded_t")
      .filter(col("doc_id") === 0).count() === 1)
  }
}
