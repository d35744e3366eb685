package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Streaming event analytics (§2.10-plus): the event-stream queries (e1/e2)
  * as Structured Streaming — watermarked tumbling-window aggregation and
  * custom sessionization state via mapGroupsWithState. The reference never
  * aggregates across files (SURVEY §4), so this is engine extension surface;
  * semantics are pinned to the BATCH twins in graft.queries.Events, which is
  * what the oracle checks (streamed result == batch result on replay).
  */
object EventStreams {

  /** Events read schema for streaming replay: ts arrives as TIMESTAMP(NANOS)
    * parquet, readable only as Long via the legacy conf (see
    * graft.core.Tables), then normalized to microsecond TimestampType.
    */
  private val rawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Replay an events parquet zone as a stream (the streaming file source
    * takes a DIRECTORY; the glob filter selects the events table out of the
    * shared sf dir — F2 as a file-index predicate again).
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Streaming twin of e1: tumbling-hour counts/sums per event type, with a
    * 2-hour watermark bounding state for late data. Output formatting is
    * identical to the batch query so the two hash-match.
    */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_ts"),
        col("event_type"), col("n_events"), col("total_value"))

  final case class Ev(event_id: Long, user_id: Long, ts: Timestamp)
  final case class SessState(lastTs: Long, nSessions: Long, nEvents: Long)
  final case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  /** Streaming twin of e2 via mapGroupsWithState: a session break is a
    * >30-minute gap between a user's consecutive events. Within a batch the
    * group iterator is sorted by (ts, event_id) — the batch query's window
    * order — and merged into running per-user state; ProcessingTimeTimeout
    * is deliberately unused (the state is a running total, never evicted —
    * per-user counters are bounded by the user population).
    */
  def userSessions(events: Dataset[Ev]): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    val GapMs = 30L * 60 * 1000
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessState, UserSessions](GroupStateTimeout.NoTimeout) {
        (user, evs, state: GroupState[SessState]) =>
          val prior = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L))
          val next = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            .foldLeft(prior) { (s, e) =>
              val isBreak = s.lastTs == Long.MinValue || e.ts.getTime > s.lastTs + GapMs
              SessState(e.ts.getTime,
                s.nSessions + (if (isBreak) 1 else 0), s.nEvents + 1)
            }
          state.update(next)
          UserSessions(user, next.nSessions, next.nEvents)
      }
  }

  final case class AttrEv(event_id: Long, user_id: Long, ts: Timestamp, event_type: String)
  final case class AttrState(trigId: Long, trigType: String, trigTsUs: Long)
  final case class Attribution(purchase_id: Long, user_id: Long,
    attributed_id: Long, attributed_type: String, lag_seconds: Long)

  /** STREAMING AS-OF JOIN (the stateful twin of graft.queries.Temporal
    * j1): per-user state is the last-seen view/click; each purchase emits
    * one attribution row against it, immediately — no buffering of the
    * probe side, state is ONE row per user. This is the shape batch as-of
    * cannot give you: attributions stream out with arrival latency instead
    * of waiting for a corpus-wide sort. Within a batch the group iterator
    * is sorted by (ts, event_id); across batches the file-replay order
    * carries state forward (the same in-order contract as
    * [[userSessions]]).
    */
  def attribution(events: Dataset[AttrEv]): Dataset[Attribution] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AttrState, Attribution](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user, evs, state: GroupState[AttrState]) =>
          def us(t: Timestamp): Long =
            t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
          var st = state.getOption.getOrElse(AttrState(-1L, null, Long.MinValue))
          val out = Seq.newBuilder[Attribution]
          evs.toSeq.sortBy(e => (us(e.ts), e.event_id)).foreach { e =>
            e.event_type match {
              case "purchase" =>
                if (st.trigId >= 0)
                  out += Attribution(e.event_id, user, st.trigId, st.trigType,
                    (us(e.ts) - st.trigTsUs) / 1000000L)
              case _ => // view / click (callers pre-filter the rest)
                st = AttrState(e.event_id, e.event_type, us(e.ts))
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Drain an events zone through a streaming query into an in-memory table
    * (complete/update modes — the finite-replay harness used by the st*
    * oracle queries and tests), returning the result frame.
    */
  def replayToTable(stream: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val spark = stream.sparkSession
    val q = stream.writeStream
      .queryName(name)
      .outputMode(mode)
      .format("memory")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
