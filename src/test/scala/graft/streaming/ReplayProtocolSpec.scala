package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.SparkTestBase

/** The round-11 replay-protocol contract, executable: `replayOnce`
  * (Trigger.Once — no trailing watermark-finalize batch) must drain to
  * EXACTLY what `replayToTable` (AvailableNow) drains, for every operator
  * class the bench-facing st* queries use. The claim rests on "every
  * operator emits at arrival" — aggregations re-emit per batch
  * (Update/Complete), the FMGWS verdict operators and stream-stream inner
  * joins emit while processing, and event-time timeouts fire eviction,
  * never rows. If a future bench query ever relies on the finalize batch
  * (an append-mode windowed aggregation, a timeout that EMITS), this spec
  * is the tripwire: route it through `replayToTable` instead.
  *
  * One representative per class, at sf0.001 (plus the conf-restore
  * contract of the shard override itself).
  */
class ReplayProtocolSpec extends SparkTestBase {

  private lazy val SfDir = testData("0.001")

  private def norm(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def bothWays(name: String)(
      build: () => (DataFrame, org.apache.spark.sql.streaming.OutputMode)): Unit = {
    val (s1, mode) = build()
    val once = norm(EventStreams.replayOnce(s1, s"rp_${name}_once", mode))
    val (s2, _) = build()
    val avail = norm(EventStreams.replayToTable(s2, s"rp_${name}_avail", mode))
    assert(once == avail, s"$name: replayOnce != replayToTable")
  }

  test("Complete-mode windowed aggregation drains identically (st2 class)") {
    bothWays("hourly") { () =>
      (EventStreams.hourlyRollup(EventStreams.readEvents(spark, SfDir)),
        org.apache.spark.sql.streaming.OutputMode.Complete())
    }
  }

  test("Update-mode FMGWS with event-time timeout drains identically after collapse (st3 class)") {
    import spark.implicits._
    def build() = EventStreams.userSessions(
      EventStreams.readEvents(spark, SfDir)
        .select("event_id", "user_id", "ts").as[EventStreams.Ev]).toDF()
    // timeouts fire in the finalize batch and may RE-EMIT rows with a
    // higher version — the contract is on the version COLLAPSE, which is
    // what every consumer of an update stream reads
    val once = norm(graft.queries.EventStreaming.collapseSessions(
      EventStreams.replayOnce(build(), "rp_sess_once",
        org.apache.spark.sql.streaming.OutputMode.Update())))
    val avail = norm(graft.queries.EventStreaming.collapseSessions(
      EventStreams.replayToTable(build(), "rp_sess_avail",
        org.apache.spark.sql.streaming.OutputMode.Update())))
    assert(once == avail)
  }

  test("Update-mode stateful aggregation (ledger) drains identically after collapse (st6 class)") {
    def build() = DocumentStreams.dedupGroups(
      DocumentStreams.readDocuments(spark, SfDir))
    val once = norm(graft.queries.EventStreaming.collapseDedup(
      EventStreams.replayOnce(build(), "rp_dedup_once",
        org.apache.spark.sql.streaming.OutputMode.Update())))
    val avail = norm(graft.queries.EventStreaming.collapseDedup(
      EventStreams.replayToTable(build(), "rp_dedup_avail",
        org.apache.spark.sql.streaming.OutputMode.Update())))
    assert(once == avail)
  }

  test("Append-mode FMGWS verdicts drain identically (st9 class)") {
    bothWays("neardup") { () =>
      (DocumentStreams.nearDupBandHits(
        DocumentStreams.readDocuments(spark, SfDir)).toDF(),
        org.apache.spark.sql.streaming.OutputMode.Append())
    }
  }

  test("Append-mode stream-stream inner join drains identically (st10 class)") {
    // sf0.01: sf0.001 has zero qualifying pairs (StreamRangeJoinSpec's
    // note) — the equality must not hold vacuously
    bothWays("keyedrange") { () =>
      (EventStreams.keyedRangeJoin(
        EventStreams.readEvents(spark, testData("0.01")),
        EventStreams.readEvents(spark, testData("0.01")),
        windowUs = 1800000000L),
        org.apache.spark.sql.streaming.OutputMode.Append())
    }
    assert(spark.table("rp_keyedrange_once").count() > 0)
  }

  test("the shard override restores the session's shuffle partitions, even on failure") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    EventStreams.replayOnce(
      EventStreams.readEvents(spark, SfDir).select("event_id"),
      "rp_conf_probe", org.apache.spark.sql.streaming.OutputMode.Append(),
      stateShards = 2)
    assert(spark.conf.get(key) == before)
    intercept[Throwable] {
      // Complete mode on a non-aggregation stream is rejected at start(),
      // INSIDE the override window; the finally must still restore
      EventStreams.replayOnce(
        EventStreams.readEvents(spark, SfDir).select("event_id"),
        "rp_conf_fail", org.apache.spark.sql.streaming.OutputMode.Complete())
    }
    assert(spark.conf.get(key) == before)
  }
}
