package graft.streaming

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryException, Trigger}

import graft.SparkTestBase
import graft.queries.{Dedup, EventStreaming, Events, Temporal}

/** CRASH-RECOVERY contract of the stateful streams (the round-6 verdict's
  * one untested exactly-once claim): a query killed MID-REPLAY — after its
  * sink wrote a batch but before the checkpoint committed it, the
  * redelivery window S3-event retry semantics live in (reference
  * `main.tf:234-263`) — must, on restart from the same checkpoint,
  *  (a) resume from the failed batch rather than reprocess from zero,
  *  (b) rebuild its flatMapGroupsWithState / stateful-agg state from the
  *      state store, and
  *  (c) drain to a final output that still equals the batch twin,
  * including the versioned-provisional collapse across the restart
  * boundary (a user whose provisional rows span the crash must be
  * superseded by post-restart versions).
  *
  * The crash is injected INSIDE foreachBatch after the batch's parquet
  * write — the hardest redelivery point: the side effect is on disk, the
  * commit is not, so the restart re-executes that batch and the sink must
  * be idempotent (per-batch-id overwrite, the same idempotence contract as
  * CleanJob's crash-safe merge). The memory sink the other stream specs use
  * cannot test this — its table dies with the query — so this spec is the
  * one place the streams run against a durable sink.
  */
class CheckpointRecoverySpec extends SparkTestBase {

  private lazy val SfDir = testData("0.001")
  private val Slices = 10
  private val Poison = 4L // crash after writing (not committing) batch 4

  /** Events zone as [[Slices]] chronological single-file parquets. */
  private def eventsZone(name: String): String = {
    val dir = scratch(name)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$SfDir/events.parquet")
      .withColumn("sl", ntile(Slices).over(Window.orderBy("ts", "event_id")))
    (1 to Slices).foreach { s =>
      ReplayFixtures.writeOne(ev.filter(col("sl") === s).drop("sl"),
        f"$dir/f$s%02d.parquet", 1700000000000L + s * 60000L)
    }
    dir
  }

  /** sf0.001 documents are all-distinct, so a recovered-but-amnesiac ledger
    * would still pass the equality check there; sf0.1 is the smallest
    * fixture with duplicate groups (8, of which 6 span the poison batch
    * under contiguous slicing) — the rows that force the restarted query to
    * REMEMBER pre-crash counts to emit n_copies=2.
    */
  private lazy val DocsSfDir = testData("0.1")

  /** Documents zone as [[Slices]] doc-id-ordered single-file parquets. */
  private def docsZone(name: String): String = {
    val dir = scratch(name)
    val docs = spark.read.parquet(s"$DocsSfDir/documents.parquet")
      .withColumn("sl", ntile(Slices).over(Window.orderBy("doc_id")))
    (1 to Slices).foreach { s =>
      ReplayFixtures.writeOne(docs.filter(col("sl") === s).drop("sl"),
        f"$dir/f$s%02d.parquet", 1700000000000L + s * 60000L)
    }
    dir
  }

  /** Run `mkStream` through a crash-at-[[Poison]] + restart cycle against an
    * idempotent per-batch-id parquet sink; returns (all update rows with
    * their batch_id, first batch id executed by the RESTARTED query).
    */
  private def crashAndRecover(name: String, mkStream: () => DataFrame,
      mode: String = "update"): (DataFrame, Long) = {
    val out = scratch(s"${name}_out")
    val ckpt = scratch(s"${name}_ckpt")
    val crashed = new AtomicBoolean(false)

    def start(armed: Boolean): StreamingQuery =
      mkStream().writeStream
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: Dataset[Row], id: Long) =>
          // idempotent sink: a redelivered batch overwrites its own dir
          df.write.mode("overwrite").parquet(s"$out/batch_id=$id")
          if (armed && id == Poison) {
            crashed.set(true)
            throw new RuntimeException(
              s"injected crash: batch $id written to sink but not committed")
          }
        }
        .start()

    val q1 = start(armed = true)
    intercept[StreamingQueryException] { q1.awaitTermination() }
    assert(crashed.get, "the poison batch never ran — zone too small?")

    val q2 = start(armed = false)
    q2.awaitTermination()
    // (a) resume, not reprocess: the restarted query's first batch is the
    // uncommitted poison batch, never anything earlier
    val firstRestartBatch = q2.recentProgress.map(_.batchId).min
    (spark.read.parquet(out), firstRestartBatch)
  }

  private def assertSame(got: DataFrame, want: DataFrame): Unit = {
    val g = got.collect().toSeq
    val w = want.collect().toSeq
    assert(g.size === w.size, s"row counts differ: ${g.size} vs ${w.size}")
    g.zip(w).foreach { case (a, b) => assert(a === b) }
  }

  /** Some group's update rows must SPAN the crash: provisional versions
    * before it, superseding versions after — the state-rebuild path.
    */
  private def assertStateSpansCrash(updates: DataFrame, key: String): Unit = {
    val spanning = updates.groupBy(key)
      .agg(min("batch_id").as("first_b"), max("batch_id").as("last_b"))
      .filter(col("first_b") <= Poison && col("last_b") > Poison)
    assert(spanning.count() > 0,
      s"no $key carried state across the restart boundary")
  }

  test("st3 sessions: crash after batch 4, restart from checkpoint, output equals batch twin") {
    import spark.implicits._
    val zone = eventsZone("rec_sess_zone")
    val (updates, firstRestart) = crashAndRecover("rec_sess", () =>
      EventStreams.userSessions(
        EventStreams.readEvents(spark, zone, glob = "*.parquet",
          maxFilesPerTrigger = Some(1))
          .select("event_id", "user_id", "ts").as[EventStreams.Ev],
        delay = "5 days").toDF())
    assert(firstRestart === Poison)
    assertStateSpansCrash(updates, "user_id")
    assertSame(EventStreaming.collapseSessions(updates.drop("batch_id")),
      Events.userSessions(spark, SfDir))
  }

  test("st5 attribution: crash after batch 4, restart from checkpoint, output equals batch twin") {
    import spark.implicits._
    val zone = eventsZone("rec_attr_zone")
    val (updates, firstRestart) = crashAndRecover("rec_attr", () =>
      EventStreams.attribution(
        EventStreams.readEvents(spark, zone, glob = "*.parquet",
          maxFilesPerTrigger = Some(1))
          .filter(col("event_type").isin("view", "click", "purchase"))
          .select("event_id", "user_id", "ts", "event_type")
          .as[EventStreams.AttrEv],
        delay = "5 days").toDF())
    assert(firstRestart === Poison)
    assertStateSpansCrash(updates, "user_id")
    assertSame(EventStreaming.collapseAttribution(updates.drop("batch_id")),
      Temporal.asofAttribution(spark, SfDir))
  }

  test("st6 dedup ledger: crash after batch 4, restart from checkpoint, ledger equals batch twin") {
    val zone = docsZone("rec_dedup_zone")
    val (updates, firstRestart) = crashAndRecover("rec_dedup", () =>
      DocumentStreams.dedupGroups(
        DocumentStreams.readDocuments(spark, zone, glob = "*.parquet",
          maxFilesPerTrigger = Some(1))))
    assert(firstRestart === Poison)
    assertStateSpansCrash(updates, "text_md5")
    assertSame(EventStreaming.collapseDedup(updates.drop("batch_id")),
      Dedup.exactDedup(spark, DocsSfDir))
  }

  test("st9 near-dup ledger: crash after batch 4, restart from checkpoint, verdicts equal batch d12") {
    val zone = docsZone("rec_neardup_zone")
    val (updates, firstRestart) = crashAndRecover("rec_neardup", () =>
      DocumentStreams.nearDupBandHits(
        DocumentStreams.readDocuments(spark, zone, glob = "*.parquet",
          maxFilesPerTrigger = Some(1))).toDF(),
      mode = "append")
    assert(firstRestart === Poison)
    // the state-rebuild path, Append-mode form: a bucket SEEDED before the
    // crash must flag a doc arriving after it — possible only if the
    // restarted query recovered the bucket's min-doc ledger entry
    val spanning = updates.groupBy("band", "bh")
      .agg(min("batch_id").as("first_b"),
        max(when(col("hit") && col("batch_id") > Poison, 1).otherwise(0))
          .as("hit_after"))
      .filter(col("first_b") <= Poison && col("hit_after") === 1)
    assert(spanning.count() > 0,
      "no bucket carried ledger state across the restart boundary")
    assertSame(EventStreaming.collapseNearDup(updates.drop("batch_id")),
      Dedup.nearDupVerdicts(spark, DocsSfDir))
  }

  test("st10 range join: crash after batch 4, restart from checkpoint, pairs equal batch j2") {
    val zone = eventsZone("rec_range_zone")
    def evs() = EventStreams.readEvents(spark, zone, glob = "*.parquet",
      maxFilesPerTrigger = Some(1))
    val (pairs, firstRestart) = crashAndRecover("rec_range", () =>
      EventStreams.rangeJoin(evs(), evs(), windowUs = 60000000L,
        delay = "5 days"),
      mode = "append")
    assert(firstRestart === Poison)
    // two-sided symmetric-hash state must recover: a pair whose purchase
    // side arrived before the crash and whose error side arrived after
    // (or vice versa) can only exist if the buffered side survived
    val t = pairs.drop("batch_id")
    val want = Temporal.rangeCorrelation(spark, SfDir)
      .select("purchase_id", "error_id", "lag_us")
    assertSame(
      t.orderBy("purchase_id", "error_id"),
      want.orderBy("purchase_id", "error_id"))
  }

  test("st12 cdc: crash after batch 4, restart from checkpoint, verdicts equal batch x5 upserts") {
    val zone = docsZone("rec_cdc_zone")
    val old = spark.read.parquet(s"$DocsSfDir/documents.parquet")
      .select("doc_id", "text")
    val (updates, firstRestart) = crashAndRecover("rec_cdc", () =>
      DocumentStreams.cdcVerdicts(
        graft.queries.Sampling.nextSnapshotOf(
          DocumentStreams.readDocuments(spark, zone, glob = "*.parquet",
            maxFilesPerTrigger = Some(1)).select("doc_id", "text")),
        old).toDF(),
      mode = "append")
    assert(firstRestart === Poison)
    // the CDC-specific recovery hazard: the INITIAL-STATE snapshot digests
    // of docs that had not yet arrived before the crash must survive the
    // restart — a doc arriving after it can only read `modified` (rather
    // than a spurious `added`) if its pre-loaded ledger entry recovered
    assert(updates.filter(col("batch_id") > Poison &&
      col("status") === "modified").count() > 0,
      "no post-restart arrival was classified against the recovered snapshot state")
    val want = graft.operators.CorpusDiff
      .diff(old, graft.queries.Sampling.nextSnapshotOf(old))
      .filter(col("status") =!= "removed").orderBy("doc_id")
    assertSame(updates.drop("batch_id").orderBy("doc_id"), want)
  }
}
