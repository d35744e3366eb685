package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

/** The bounded-state dedup variant (`dropDuplicatesWithinWatermark`) under
  * deterministic multi-batch replay: proves BOTH halves of its contract —
  * duplicates inside the watermark horizon collapse, and once the watermark
  * passes a digest's horizon its state is evicted (so a later re-crawl
  * re-emits AND the state store stays bounded instead of accumulating every
  * digest ever seen, which is exactly what the global st6 ledger does).
  *
  * Timeline (delay = 30 min; watermark trails one batch, so eviction of a
  * batch's state needs a LATER batch whose max event time passes the
  * horizon):
  *   f0 @ T0        40 originals               -> all emit
  *   f1 @ T0+10m    10 duplicates              -> in-horizon, all dropped
  *   f2 @ T0+3h     10 fresh texts             -> emit; advances watermark
  *   f3 @ T0+3h5m   1 filler text              -> emit; end-of-batch state
  *                                                cleanup (which runs AFTER
  *                                                a batch's dedup checks,
  *                                                with the watermark f2
  *                                                advanced) evicts f0
  *   f4 @ T0+3h10m  10 duplicates of f0 texts  -> state gone, re-emit
  *   f5 @ T0+7h     1 new text                 -> emit; advances watermark
  *                                                past the f2..f4 horizon
  */
class BoundedDedupSpec extends SparkTestBase {

  private lazy val SfDir = testData("0.001")
  private val T0 = 1700000000000L // fixed epoch; files staggered by mtime
  private val Hour = 3600000L

  /** Docs tagged with a constant event time (millis). */
  private def at(df: DataFrame, ts: Long): DataFrame =
    df.withColumn("event_ts", timestamp_millis(lit(ts)))

  test("in-horizon duplicates collapse, post-horizon re-crawls re-emit, state is evicted") {
    val dir = scratch("bounded_dedup")
    val docs = spark.read.parquet(s"$SfDir/documents.parquet") // 50 docs
    val base = docs.filter(col("doc_id") < 40)
    val dups = base.filter(col("doc_id") < 10)
    def shifted(by: Long) = dups.withColumn("doc_id", col("doc_id") + by)
    val fresh = docs.filter(col("doc_id").between(40, 49))
      .withColumn("doc_id", col("doc_id") + 900000L)
    // extra distinct texts: changed re-crawls of docs 0 and 1
    def changed(src: Long, id: Long) = docs.filter(col("doc_id") === src)
      .withColumn("text", concat(col("text"), lit(" v2 recrawl delta")))
      .withColumn("doc_id", lit(id))

    ReplayFixtures.writeOne(at(base, T0), s"$dir/f0.parquet", T0)
    ReplayFixtures.writeOne(at(shifted(100000L), T0 + 600000L),
      s"$dir/f1.parquet", T0 + 60000L)
    ReplayFixtures.writeOne(at(fresh, T0 + 3 * Hour),
      s"$dir/f2.parquet", T0 + 120000L)
    ReplayFixtures.writeOne(at(changed(1, 990000L), T0 + 3 * Hour + 300000L),
      s"$dir/f3.parquet", T0 + 180000L)
    ReplayFixtures.writeOne(at(shifted(200000L), T0 + 3 * Hour + 600000L),
      s"$dir/f4.parquet", T0 + 240000L)
    ReplayFixtures.writeOne(at(changed(0, 995000L), T0 + 7 * Hour),
      s"$dir/f5.parquet", T0 + 300000L)

    val stream = DocumentStreams.dedupWithinWatermark(
      DocumentStreams.readDocumentsWithTs(
        spark, dir, glob = "*.parquet", maxFilesPerTrigger = Some(1)),
      delay = "30 minutes")
    val q = stream.writeStream
      .queryName("bounded_dedup_t")
      .outputMode("append")
      .format("memory")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table("bounded_dedup_t")

    // f0's 40 originals all emitted once
    assert(out.filter(col("doc_id") < 40).count() === 40)
    // f1's in-horizon duplicates were dropped entirely
    assert(out.filter(col("doc_id").between(100000L, 199999L)).count() === 0)
    // f4's post-horizon re-crawl re-emitted all 10 recurring texts
    assert(out.filter(col("doc_id").between(200000L, 299999L)).count() === 10)
    // f2 fresh + the two changed re-crawls emitted
    assert(out.filter(col("doc_id") >= 900000L).count() === 12)
    // no digest emitted more than its horizon-separated arrivals
    assert(out.groupBy("text_md5").count()
      .filter(col("count") > 2).count() === 0)

    // eviction really happened (f0's 40 digests removed when f2 advanced
    // the watermark), and the FINAL state holds only in-horizon digests —
    // not the 51 distinct digests seen across the run
    val progresses = q.recentProgress.filter(_.stateOperators.nonEmpty)
    assert(progresses.map(_.stateOperators.head.numRowsRemoved).sum >= 40)
    val finalState = progresses.last.stateOperators.head.numRowsTotal
    val distinctSeen = spark.read.schema(DocumentStreams.docSchemaWithTs)
      .parquet(dir).select(md5(col("text"))).distinct().count()
    assert(finalState < distinctSeen,
      s"state ($finalState rows) was never evicted (distinct=$distinctSeen)")
  }
}
