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
}
