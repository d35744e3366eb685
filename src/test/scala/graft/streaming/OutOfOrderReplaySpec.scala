package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase
import graft.queries.{EventStreaming, Events, Temporal}

/** The cross-batch DISORDER contract of the stateful streams: an events
  * zone split into 3 files replayed one-file-per-micro-batch in
  * NON-CHRONOLOGICAL order (middle third first, then the earliest third,
  * then the latest) must still reproduce the batch results exactly. This is
  * the case a single-file AvailableNow replay can never exercise — state
  * carried across batches with earlier event-times arriving later.
  */
class OutOfOrderReplaySpec extends SparkTestBase {

  private lazy val SfDir = testData("0.001")

  /** Split the events table into time-thirds and write them as three
    * single-file parquets whose MODIFICATION TIMES impose the given arrival
    * order (the file stream source processes oldest-mtime first).
    */
  private def splitZone(name: String, arrivalOrder: Seq[Int]): String = {
    val dir = scratch(name)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$SfDir/events.parquet")
      .withColumn("third", ntile(3).over(Window.orderBy("ts", "event_id")))
    arrivalOrder.zipWithIndex.foreach { case (third, i) =>
      // one minute apart: unambiguous source ordering at mtime resolution
      ReplayFixtures.writeOne(ev.filter(col("third") === third).drop("third"),
        s"$dir/f$third.parquet", 1700000000000L + i * 60000L)
    }
    dir
  }

  private def streamSessions(zone: String, table: String, delay: String): DataFrame = {
    import spark.implicits._
    val evs = EventStreams
      .readEvents(spark, zone, glob = "*.parquet", maxFilesPerTrigger = Some(1))
      .select("event_id", "user_id", "ts").as[EventStreams.Ev]
    EventStreams.replayToTable(
      EventStreams.userSessions(evs, delay).toDF(), table, OutputMode.Update())
  }

  private def streamAttribution(zone: String, table: String, delay: String): DataFrame = {
    import spark.implicits._
    val evs = EventStreams
      .readEvents(spark, zone, glob = "*.parquet", maxFilesPerTrigger = Some(1))
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select("event_id", "user_id", "ts", "event_type").as[EventStreams.AttrEv]
    EventStreams.replayToTable(
      EventStreams.attribution(evs, delay).toDF(), table, OutputMode.Update())
  }

  private def assertSame(got: DataFrame, want: DataFrame): Unit = {
    val g = got.collect().toSeq
    val w = want.collect().toSeq
    assert(g.size === w.size)
    g.zip(w).foreach { case (a, b) => assert(a === b) }
  }

  test("sessions survive non-chronological 3-file replay (disorder > batch span)") {
    val zone = splitZone("ooo_sess", Seq(2, 1, 3))
    val updates = streamSessions(zone, "ooo_sess_t", "40 days")
    // multi-batch state really exercised: some user was re-invoked
    assert(updates.agg(max("ver")).collect()(0).getLong(0) > 1)
    assertSame(EventStreaming.collapseSessions(updates),
      Events.userSessions(spark, SfDir))
  }

  test("attribution survives non-chronological 3-file replay") {
    val zone = splitZone("ooo_attr", Seq(2, 1, 3))
    val updates = streamAttribution(zone, "ooo_attr_t", "40 days")
    assert(updates.agg(max("ver")).collect()(0).getLong(0) > 1)
    assertSame(EventStreaming.collapseAttribution(updates),
      Temporal.asofAttribution(spark, SfDir))
  }

  test("watermark folding path: chronological replay with a small delay still matches") {
    // arrival = chronological thirds; delay (5 days) << zone span (30 days),
    // so batches 2-3 fold ripe buffered events into committed state — the
    // finalization path the 40-day tests never reach
    val zone = splitZone("ooo_fold", Seq(1, 2, 3))
    val sess = streamSessions(zone, "ooo_fold_sess", "5 days")
    assertSame(EventStreaming.collapseSessions(sess),
      Events.userSessions(spark, SfDir))
    val attr = streamAttribution(zone, "ooo_fold_attr", "5 days")
    assertSame(EventStreaming.collapseAttribution(attr),
      Temporal.asofAttribution(spark, SfDir))
  }
}
