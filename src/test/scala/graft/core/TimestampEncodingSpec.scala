package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase
import graft.streaming.{EventStreams, ReplayFixtures}

/** Pins the events readers against the one thing the engine does NOT
  * control: how a producer flagged the parquet `ts` column. The same
  * instants arrive in the wild as UTC-adjusted TIMESTAMP(MICROS)
  * (isAdjustedToUTC=true), naive TIMESTAMP(MICROS) (=false, which Spark 4
  * would otherwise infer as TIMESTAMP_NTZ and silently shift every
  * event-time semantic), or TIMESTAMP(NANOS) readable only as raw Long.
  * The round-7→8 testdata regeneration switched encodings mid-stream and
  * took out five queries at the gate (j1/j2 analysis errors; st2/st3/st5
  * watermarking 1000×-compressed times) — this spec makes any future
  * encoding drift a local test failure instead of a round-level incident.
  *
  * Contract under test: for each encoding, the BATCH loader (Tables.events)
  * and the STREAMING reader (EventStreams.readEvents) both produce
  * session-tz TimestampType with identical microsecond instants.
  */
class TimestampEncodingSpec extends SparkTestBase {

  private lazy val SfDir = testData("0.001")

  /** (event_id, micros) pairs — the encoding-independent ground truth. */
  private def canon(df: DataFrame): Set[(Long, Long)] =
    df.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val base = {
    val b = Tables(spark, SfDir).events
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .orderBy("event_id").limit(200).cache()
    b.count()
    b
  }

  /** Write `base` under dir/events.parquet with ts re-encoded by `enc`. */
  private def zoneWith(name: String, enc: DataFrame => DataFrame): String = {
    val dir = scratch(s"tsenc_$name")
    ReplayFixtures.writeOne(enc(base), s"$dir/events.parquet", 1700000000000L)
    dir
  }

  private def batchRead(dir: String): DataFrame = Tables(spark, dir).events

  private def streamRead(dir: String): DataFrame =
    EventStreams.replayToTable(
      EventStreams.readEvents(spark, dir)
        .groupBy("event_id").agg(max("ts").as("ts")),
      s"tsenc_${dir.hashCode.abs}", OutputMode.Complete())

  private def checkZone(name: String, enc: DataFrame => DataFrame): Unit = {
    val want = canon(base)
    val dir = zoneWith(name, enc)
    val b = batchRead(dir)
    assert(b.schema("ts").dataType === org.apache.spark.sql.types.TimestampType,
      s"$name: batch read must normalize to session-tz TimestampType")
    assert(canon(b) === want, s"$name: batch instants drifted")
    assert(canon(streamRead(dir)) === want, s"$name: streamed instants drifted")
  }

  test("UTC-adjusted TIMESTAMP(MICROS) reads identically in batch and stream") {
    checkZone("utc", identity)
  }

  test("naive TIMESTAMP(MICROS) (pyarrow-default, the r8 testdata shape) is not NTZ-shifted") {
    checkZone("naive",
      _.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampNTZType)))
  }

  test("raw int64 nanos (the TIMESTAMP(NANOS)-as-Long shape) divides back to the same instants") {
    checkZone("nanos",
      _.withColumn("ts", (unix_micros(col("ts")) * 1000L)))
  }
}
