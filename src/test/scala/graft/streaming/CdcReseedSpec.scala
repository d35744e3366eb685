package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

/** The CDC compaction path ([[DocumentStreams.reseedCdc]]): stop the
  * stream, re-seed its ledger from the CURRENT clean zone, resume — and
  * prove the resumed stream's verdicts equal a fresh batch diff against
  * the compacted snapshot. The discriminating cases:
  *
  *  - a doc MODIFIED during phase 1 re-arrives with the same (phase-1)
  *    text: the clean zone already holds that digest, so the reseeded
  *    stream is SILENT — whereas a stream still seeded from the stale
  *    pre-compaction snapshot would re-emit `modified` (asserted as the
  *    contrast case);
  *  - a doc modified AGAIN after the reseed reads `modified` against the
  *    compacted digest;
  *  - a doc the clean zone has never seen reads `added`;
  *  - redelivery of a phase-1 upsert across the handover is silence —
  *    the exactly-once-across-reseed contract.
  */
class CdcReseedSpec extends SparkTestBase {

  private lazy val SfDir = testData("0.001")
  private val T0 = 1700000000000L

  private def at(df: DataFrame, ts: Long): DataFrame =
    df.withColumn("event_ts", timestamp_millis(lit(ts)))

  private def drain(verdicts: DataFrame, name: String) = {
    val q = verdicts.writeStream.queryName(name).outputMode("append")
      .format("memory").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q
  }

  private def stream(dir: String): DataFrame =
    DocumentStreams.readDocumentsWithTs(
      spark, dir, glob = "*.parquet", maxFilesPerTrigger = Some(1))
      .select("doc_id", "text")

  test("post-reseed verdicts equal a fresh batch diff of the compacted zone") {
    val docs = spark.read.parquet(s"$SfDir/documents.parquet") // 50 docs
      .select("doc_id", "text")
    def doc(id: Long) = docs.filter(col("doc_id") === id)
    def fresh(src: Long, id: Long) = doc(src)
      .withColumn("doc_id", lit(id))
      .withColumn("text", concat(col("text"), lit(s" fresh $id")))
    val s0 = docs.filter(col("doc_id") < 40)

    // phase 1: docs 0-4 modified, doc 100 new
    val modified = docs.filter(col("doc_id") < 5)
      .withColumn("text", concat(col("text"), lit(" v2")))
    val a1 = modified.unionByName(fresh(40, 100L))
    val dir1 = scratch("cdc_reseed_p1")
    ReplayFixtures.writeOne(at(a1, T0), s"$dir1/f0.parquet", T0)
    val q1 = drain(
      DocumentStreams.cdcVerdicts(stream(dir1), s0).toDF(), "cdc_rs_p1_t")
    assert(spark.table("cdc_rs_p1_t").count() === 6) // 5 modified + 1 added

    // compaction: the clean zone after applying phase 1's upserts — what
    // batch x5 + the shard upsert leave on disk
    val s1 = s0.join(a1, Seq("doc_id"), "left_anti").unionByName(a1)
      .localCheckpoint()

    // phase 2 arrivals: redelivered phase-1 rows (doc 0 v2, doc 100),
    // a fresh modification (doc 1 v3), a brand-new doc (200), and a doc
    // outside the compacted zone (45)
    val a2 = doc(0).withColumn("text", concat(col("text"), lit(" v2")))
      .unionByName(docs.filter(col("doc_id") === 1)
        .withColumn("text", concat(col("text"), lit(" v3"))))
      .unionByName(fresh(40, 100L))
      .unionByName(fresh(41, 200L))
      .unionByName(doc(45))
    val dir2 = scratch("cdc_reseed_p2")
    ReplayFixtures.writeOne(at(a2, T0 + 3600000L), s"$dir2/f0.parquet", T0 + 60000L)

    // the reseed: stop q1, classify phase 2 against the COMPACTED zone
    // (fresh query name -> fresh checkpoint, per the helper's contract)
    drain(DocumentStreams.reseedCdc(q1, stream(dir2), s1).toDF(), "cdc_rs_p2_t")
    val got = spark.table("cdc_rs_p2_t").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

    // the batch twin: each arrival against the compacted zone's digests
    val digest = graft.operators.CorpusDiff.contentDigest _
    val want = a2.select(col("doc_id"), digest(col("text")).as("new_md5"))
      .join(s1.select(col("doc_id"), digest(col("text")).as("old_md5")),
        Seq("doc_id"), "left")
      .withColumn("status",
        when(col("old_md5").isNull, "added")
          .when(col("old_md5") =!= col("new_md5"), "modified"))
      .filter(col("status").isNotNull)
      .collect().map(r => (r.getLong(0), r.getString(3))).toSet
    assert(got == want)
    // and the discriminating rows are exactly these
    assert(got == Set((1L, "modified"), (200L, "added"), (45L, "added")))

    // contrast: WITHOUT compaction (still seeded from stale s0), the
    // redelivered doc-0 v2 row re-reads as `modified` — the state the
    // reseed exists to avoid
    drain(DocumentStreams.cdcVerdicts(stream(dir2), s0).toDF(), "cdc_rs_stale_t")
    assert(spark.table("cdc_rs_stale_t")
      .filter(col("doc_id") === 0 && col("status") === "modified")
      .count() === 1)
  }

  test("reseedCdc refuses a non-empty checkpoint location (the footgun guard)") {
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
      .select("doc_id", "text")
    val dir = scratch("cdc_reseed_guard")
    ReplayFixtures.writeOne(at(docs.limit(2), T0), s"$dir/f0.parquet", T0)
    val q = drain(
      DocumentStreams.cdcVerdicts(stream(dir), docs.limit(1)).toDF(),
      "cdc_rs_guard_t")
    // a USED checkpoint: any non-empty directory stands in for the old
    // query's checkpoint — the guard is structural, not content-aware
    val used = scratch("cdc_reseed_guard_ckpt")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(used, "offsets"))
    val e = intercept[IllegalArgumentException] {
      DocumentStreams.reseedCdc(q, stream(dir), docs.limit(1),
        checkpointLocation = Some(used))
    }
    assert(e.getMessage.contains("FRESH checkpoint"))
    // a fresh (nonexistent) path passes and the reseeded stream drains
    val fresh = s"${scratch("cdc_reseed_guard_fresh")}/ckpt"
    val verdicts = DocumentStreams.reseedCdc(q, stream(dir), docs.limit(1),
      checkpointLocation = Some(fresh))
    drain(verdicts.toDF(), "cdc_rs_guard_fresh_t")
    assert(spark.table("cdc_rs_guard_fresh_t").count() >= 1)
  }

  test("startReseeded binds the validated checkpoint to the query it starts") {
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
      .select("doc_id", "text")
    val dir = scratch("cdc_reseed_bind")
    ReplayFixtures.writeOne(at(docs.limit(3), T0), s"$dir/f0.parquet", T0)
    val q = drain(
      DocumentStreams.cdcVerdicts(stream(dir), docs.limit(1)).toDF(),
      "cdc_rs_bind_t")
    val verdicts = DocumentStreams.reseedCdc(q, stream(dir), docs.limit(1))
    // the used-path refusal happens at START time, not just at reseed time
    val used = scratch("cdc_reseed_bind_used")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(used, "offsets"))
    intercept[IllegalArgumentException] {
      DocumentStreams.startReseeded(verdicts, used)(
        _.queryName("cdc_rs_bind_never").outputMode("append").format("memory")
          .trigger(Trigger.AvailableNow()))
    }
    // a fresh path starts, and the query RUNS ON that path — the sink's
    // checkpoint cannot diverge from the validated one (the binding is
    // applied after the caller's sink config, so it wins)
    val fresh = s"${scratch("cdc_reseed_bind_fresh")}/ckpt"
    val q2 = DocumentStreams.startReseeded(verdicts, fresh)(
      _.queryName("cdc_rs_bind_t2").outputMode("append").format("memory")
        .trigger(Trigger.AvailableNow())
        // a caller-supplied conflicting path must NOT survive
        .option("checkpointLocation", used))
    q2.awaitTermination()
    assert(spark.table("cdc_rs_bind_t2").count() >= 1)
    assert(new java.io.File(fresh, "offsets").isDirectory,
      "query did not run on the validated checkpoint path")
  }
}
