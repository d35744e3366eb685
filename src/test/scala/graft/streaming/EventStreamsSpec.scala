package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

/** Streaming semantics the finite-replay oracle queries can't show:
  * watermark-driven window emission/eviction in append mode, and session
  * state carried correctly ACROSS micro-batches.
  */
class EventStreamsSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("append mode emits a window only after the watermark passes its end") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val out = EventStreams.hourlyRollup(
      mem.toDF().toDF("ts", "event_type", "value"))
    val q = out.writeStream.queryName("wm_test")
      .outputMode(OutputMode.Append()).format("memory").start()
    try {
      mem.addData((ts("2026-01-01 10:10:00"), "click", 1.0),
        (ts("2026-01-01 10:20:00"), "click", 2.0))
      q.processAllAvailable()
      // watermark still at 08:20 -> nothing closed yet
      assert(spark.table("wm_test").count() === 0)

      // an event at 13:30 advances the watermark to 11:30 > 11:00 window end
      mem.addData((ts("2026-01-01 13:30:00"), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("wm_test").collect()
      assert(rows.length === 1)
      assert(rows(0).getAs[String]("hour_ts") === "2026-01-01 10:00:00")
      assert(rows(0).getAs[Long]("n_events") === 2L)
      // the 13:00 window stays open (held as state, not emitted)
    } finally q.stop()
  }

  test("session state carries across micro-batches; >30min gap opens a new session") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[EventStreams.Ev]
    val q = EventStreams.userSessions(mem.toDS()).toDF()
      .writeStream.queryName("sess_test")
      .outputMode(OutputMode.Update()).format("memory").start()
    try {
      // batch 1: two events 10 min apart -> one session
      mem.addData(EventStreams.Ev(1, 7, ts("2026-01-01 10:00:00")),
        EventStreams.Ev(2, 7, ts("2026-01-01 10:10:00")))
      q.processAllAvailable()
      // batch 2: 50 min after the last event -> second session, same user
      mem.addData(EventStreams.Ev(3, 7, ts("2026-01-01 11:00:00")))
      q.processAllAvailable()
      val last = spark.table("sess_test")
        .orderBy(desc("n_events")).collect()(0)
      assert(last.getAs[Long]("user_id") === 7L)
      assert(last.getAs[Long]("n_events") === 3L)
      assert(last.getAs[Long]("n_sessions") === 2L)
    } finally q.stop()
  }

  test("null event times drop at entry instead of poisoning the stateful streams") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val nullTs: Timestamp = null

    // sessions: the null-ts row contributes nothing (it used to NPE in the
    // typed state function — one poison row killing the stream)
    val sessMem = MemoryStream[EventStreams.Ev]
    val sessQ = EventStreams.userSessions(sessMem.toDS()).toDF()
      .writeStream.queryName("nullts_sess")
      .outputMode(OutputMode.Update()).format("memory").start()
    try {
      sessMem.addData(EventStreams.Ev(1, 7, ts("2026-01-01 10:00:00")),
        EventStreams.Ev(2, 7, nullTs),
        EventStreams.Ev(3, 7, ts("2026-01-01 10:10:00")))
      sessQ.processAllAvailable()
      val r = spark.table("nullts_sess").orderBy(desc("ver")).collect()(0)
      assert(r.getAs[Long]("n_events") === 2L, "null-ts event was counted")
      assert(r.getAs[Long]("n_sessions") === 1L)
    } finally sessQ.stop()

    // attribution: a null-ts TRIGGER must never attribute and a null-ts
    // PURCHASE must fall out unmatched — the batch as-of contract
    val attrMem = MemoryStream[EventStreams.AttrEv]
    val attrQ = EventStreams.attribution(attrMem.toDS()).toDF()
      .writeStream.queryName("nullts_attr")
      .outputMode(OutputMode.Update()).format("memory").start()
    try {
      attrMem.addData(
        EventStreams.AttrEv(1, 7, ts("2026-01-01 10:00:00"), "view"),
        EventStreams.AttrEv(4, 7, nullTs, "click"), // must not attribute
        EventStreams.AttrEv(2, 7, nullTs, "purchase"), // must fall out
        EventStreams.AttrEv(5, 7, ts("2026-01-01 10:05:00"), "purchase"))
      attrQ.processAllAvailable()
      val rows = spark.table("nullts_attr").collect()
      assert(rows.forall(_.getAs[Long]("purchase_id") != 2L),
        "null-ts purchase was attributed")
      val p5 = rows.filter(_.getAs[Long]("purchase_id") == 5L)
      assert(p5.nonEmpty && p5.forall(_.getAs[Long]("attributed_id") === 1L),
        "null-ts trigger leaked into the attribution state")
    } finally attrQ.stop()

    // stream-stream range join: null-ts rows could never pair, but they
    // would sit in the join state forever (null defeats the watermark
    // eviction compare) — they must be filtered before entering state
    val pMem = MemoryStream[(Long, Timestamp, Long, String)]
    val eMem = MemoryStream[(Long, Timestamp, Long, String)]
    def evDf(m: MemoryStream[(Long, Timestamp, Long, String)]) =
      m.toDF().toDF("event_id", "ts", "user_id", "event_type")
    val rjQ = EventStreams.keyedRangeJoin(evDf(pMem), evDf(eMem),
      windowUs = 60000000L)
      .writeStream.queryName("nullts_rj")
      .outputMode(OutputMode.Append()).format("memory").start()
    try {
      pMem.addData((1L, ts("2026-01-01 10:00:00"), 7L, "purchase"),
        (4L, nullTs, 7L, "purchase"))
      eMem.addData((2L, nullTs, 7L, "error"),
        (3L, ts("2026-01-01 10:00:30"), 7L, "error"))
      rjQ.processAllAvailable()
      val pairs = spark.table("nullts_rj")
        .select("purchase_id", "error_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs === Set((1L, 3L)), s"wrong pairs: $pairs")
    } finally rjQ.stop()
  }
}
