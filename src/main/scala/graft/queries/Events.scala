package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Event-stream analytics in batch form (the reference is a file-granularity
  * stream, SURVEY §1.1/§2.10; the streaming pipeline itself lives in
  * graft.streaming.PipelineStreams).
  *
  * Time bucketing uses date_trunc — a pure projection, so the aggregation
  * shuffles on (bucket, type), which stays balanced as data scales; user
  * sessionization partitions by user_id, the natural high-cardinality key.
  */
object Events {

  /** Tumbling-hour event counts/values per type. */
  def hourlyRollup(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_ts"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .orderBy("hour_ts", "event_type")

  val hourlyRollupSql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
      | event_type, count(*) AS n_events, round(sum(value), 2) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour_ts, event_type""".stripMargin

  /** Session counting: a session break is a >30-minute gap between a user's
    * consecutive events (lag window + conditional sum).
    */
  def userSessions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    Tables(spark, dir).events
      // null event times are excluded BY CONTRACT (shared with the st3
      // streaming twin, which drops them at entry): the engines place
      // NULL at opposite ends of an ASC window (Spark NULLS FIRST,
      // DuckDB NULLS LAST), so an unfiltered null-ts row pairs different
      // lag() neighbors in each engine and moves n_sessions
      .filter(col("ts").isNotNull)
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1L).otherwise(0L))
      .groupBy("user_id")
      .agg(sum("new_sess").as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  val userSessionsSql: String =
    """SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
      | count(*) AS n_events
      |FROM (SELECT user_id,
      |        CASE WHEN lag(ts, 1) OVER w IS NULL
      |               OR ts > lag(ts, 1) OVER w + INTERVAL 30 MINUTE
      |             THEN 1 ELSE 0 END AS new_sess
      |      FROM events WHERE ts IS NOT NULL
      |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** e6: the SAME sessionization through Spark's built-in `session_window`
    * aggregation — the prefer-built-ins rule made executable: where a
    * native operator expresses the semantics, use it and let Catalyst own
    * the plan (one merging-session hash aggregate; no lag window, no
    * self-ordering pass), and pin it to the hand-rolled twin's oracle.
    *
    * Boundary calibration: `session_window(ts, d)` merges events with
    * gap < d (a gap of exactly d BREAKS), while e2's lag formulation
    * breaks only on gap > 30min (exactly 30min stays merged). On
    * microsecond timestamps the two coincide EXACTLY at
    * d = 30min + 1µs: gap < 30min+1µs ⟺ gap ≤ 30min ⟺ not(gap > 30min).
    * No fixture luck involved — the equivalence is integer arithmetic.
    */
  def sessionWindows(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes 1 microsecond"))
      .agg(count(lit(1)).as("n_ev"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_ev").as("n_events"))
      .orderBy("user_id")

  /** e7: CONVERSION FUNNEL — view → click → purchase in strict temporal
    * order per user (each stage's timestamp must follow the PREVIOUS
    * stage's, not merely exist): the staged-minimum shape every product
    * analytics stack runs. Three aggregate+join stages over a SHRINKING
    * user frame: stage k's per-user minimum broadcasts back against the
    * next stage's single-type slice of the scan, so the corpus is
    * filtered by event type before any join and each stage's join side
    * is users-surviving-so-far (monotonically smaller). Output: the
    * converted users with their stage timestamps and total lag.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events.select("user_id", "ts", "event_type")
    // no broadcast() hint on the survivors frame: it is one row per user
    // surviving the funnel so far — user-population-sized, not
    // dimension-sized — and a mandatory hint bypasses
    // autoBroadcastJoinThreshold, shipping the full frame to every
    // executor at 100 TB scale (OOM / broadcast-size abort). AQE still
    // broadcasts it when it measures small; at scale it shuffles, which
    // is the correct plan for a fact-sized build side.
    def stage(slice: DataFrame, prev: DataFrame, prevTs: String,
        outTs: String): DataFrame =
      slice.join(prev, "user_id")
        .filter(col("ts") > col(prevTs))
        .groupBy((prev.columns :+ "user_id").distinct.map(col): _*)
        .agg(min("ts").as(outTs))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("view_ts"))
    val c = stage(ev.filter(col("event_type") === "click"), v, "view_ts", "click_ts")
    val p = stage(ev.filter(col("event_type") === "purchase"), c, "click_ts", "purchase_ts")
    p.select(col("user_id"),
        date_format(col("view_ts"), "yyyy-MM-dd HH:mm:ss").as("view_ts"),
        date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
        date_format(col("purchase_ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("view_ts")))
          .as("funnel_seconds"))
      .orderBy("user_id")
  }

  val funnelSql: String =
    """WITH v AS (
      |  SELECT user_id, min(ts) AS view_ts FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, v.view_ts, min(e.ts) AS click_ts
      |  FROM events e JOIN v USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > v.view_ts
      |  GROUP BY e.user_id, v.view_ts),
      |p AS (
      |  SELECT e.user_id, c.view_ts, c.click_ts, min(e.ts) AS purchase_ts
      |  FROM events e JOIN c USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
      |  GROUP BY e.user_id, c.view_ts, c.click_ts)
      |SELECT user_id,
      |  strftime(view_ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
      |  strftime(click_ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
      |  strftime(purchase_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
      |  CAST(floor(date_part('epoch', purchase_ts))
      |    - floor(date_part('epoch', view_ts)) AS BIGINT) AS funnel_seconds
      |FROM p ORDER BY user_id""".stripMargin

  /** Per-user conditional aggregation (manual pivot over event types). */
  def userTypePivot(spark: SparkSession, dir: String): DataFrame = {
    def cnt(t: String) = sum(when(col("event_type") === t, 1L).otherwise(0L))
    Tables(spark, dir).events
      .groupBy("user_id")
      .agg(
        cnt("purchase").as("n_purchase"),
        cnt("click").as("n_click"),
        cnt("view").as("n_view"),
        cnt("signup").as("n_signup"),
        cnt("error").as("n_error"),
        round(sum(when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0))), 2)
          .as("purchase_value"))
      .orderBy("user_id")
  }

  val userTypePivotSql: String =
    """SELECT user_id,
      | CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
      | CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
      | CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
      | CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
      | CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
      | round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 2) AS purchase_value
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** JSON prop extraction (the reference's tolerant JSON parse, SURVEY P15):
    * props is a JSON string column. get_json_object + cast matches the
    * DuckDB oracle's json_extract_string + CAST exactly, INCLUDING
    * string-encoded numbers ({"k": "95"}) — from_json with a LONG field
    * would reject those rows and silently diverge.
    */
  def propsExtract(spark: SparkSession, dir: String): DataFrame = {
    // tolerant numeric parse = INTEGRAL STRINGS ONLY, by explicit regex on
    // both engines: a bare cast on "90.5" ABORTS under ANSI Spark
    // (CAST_INVALID_INPUT) while DuckDB ROUNDS it to 91 — a job-crash on
    // one side and a silently different row on the other. The regex pins
    // one semantics everywhere: non-integral values are null (filtered).
    // try_cast (not cast) behind the regex: the regex admits integral
    // strings BEYOND Long range ("99999999999999999999"), where ANSI cast
    // still aborts with CAST_OVERFLOW — try_cast degrades them to null,
    // and the oracle's TRY_CAST(... AS BIGINT) nulls the same values, so
    // "non-integral or unrepresentable ⇒ null, never abort" holds end to
    // end on both engines.
    // ONE json parse + ONE regex pass per row: `when(raw.rlike(...),
    // raw.try_cast(...))` evaluates the unconditional rlike branch and the
    // conditional cast branch separately, and conditional branches are
    // excluded from codegen subexpression elimination — so get_json_object
    // re-parsed props per row (measured 1.14 s vs 0.69 s at sf0.1).
    // regexp_extract applies the SAME anchored pattern (no match → "" →
    // try_cast null, exactly the old when-otherwise-null), then the same
    // try_cast degrades unrepresentable integrals to null — value-identical
    // on every row (oracle-hash-checked), half the JSON/regex work.
    val raw = get_json_object(col("props"), "$.k")
    Tables(spark, dir).events
      .select(
        col("event_id"),
        regexp_extract(raw, "^(-?[0-9]+)$", 1).try_cast("long").as("k"))
      .filter(col("k") >= 90)
      .orderBy("event_id")
  }

  val propsExtractSql: String =
    """SELECT event_id, k FROM (
      |  SELECT event_id,
      |    CASE WHEN regexp_matches(json_extract_string(props, '$.k'), '^-?[0-9]+$')
      |         THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k
      |  FROM events)
      |WHERE k >= 90
      |ORDER BY event_id""".stripMargin

  /** e5: INCREMENTAL rollup maintenance — `Rollups.fold` driven as an
    * ingest simulation: the events table split into three contiguous
    * time ranges (the nightly-delta shape), folded range-by-range into a
    * rollup state that starts empty, displayed once after the last fold.
    * The oracle is e1's SQL verbatim — the operator's whole claim is that
    * O(delta) incremental refresh equals the one-shot O(history)
    * aggregate, and the gate checks that equality against an independent
    * engine. State is localCheckpoint'ed between folds exactly as a real
    * pipeline persists it between nightly runs; measures stay raw doubles
    * in state and round only here, at read time.
    */
  def incrementalRollup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(
        date_trunc("hour", col("ts")).as("hour"),
        col("event_type"), col("value"))
    val Array(lo, hi) = ev.agg(min("hour"), max("hour"))
      .collect().map(r => Seq(r.getTimestamp(0), r.getTimestamp(1))).head.toArray
    // an EMPTY (or fully filtered) events table yields null min/max — fold
    // zero deltas and return the empty rollup like the one-shot oracle,
    // instead of NPE-ing on lo.getTime at the driver
    val deltas = if (lo == null) Seq.empty else {
      val (t1, t2) = (
        new java.sql.Timestamp(lo.getTime + (hi.getTime - lo.getTime) / 3),
        new java.sql.Timestamp(lo.getTime + 2 * (hi.getTime - lo.getTime) / 3))
      Seq(
        ev.filter(col("hour") <= lit(t1)),
        ev.filter(col("hour") > lit(t1) && col("hour") <= lit(t2)),
        ev.filter(col("hour") > lit(t2)))
    }
    val keys = Seq("hour", "event_type")
    var state = graft.operators.Rollups.emptyRollup(spark,
      Seq("hour" -> org.apache.spark.sql.types.TimestampType,
        "event_type" -> org.apache.spark.sql.types.StringType))
    deltas.foreach { d =>
      state = graft.operators.Rollups.fold(d, state, keys).localCheckpoint()
    }
    state.select(
      date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour_ts"),
      col("event_type"), col("n_events"),
      round(col("total_value"), 2).as("total_value"))
      .orderBy("hour_ts", "event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e7_funnel" -> (funnel _),
    "e6_session_windows" -> (sessionWindows _),
    "e1_hourly_rollup" -> (hourlyRollup _),
    "e5_incremental_rollup" -> (incrementalRollup _),
    "e2_user_sessions" -> (userSessions _),
    "e3_user_type_pivot" -> (userTypePivot _),
    "e4_props_extract" -> (propsExtract _))

  val oracles: Map[String, String] = Map(
    "e7_funnel" -> funnelSql,
    "e6_session_windows" -> userSessionsSql,
    "e1_hourly_rollup" -> hourlyRollupSql,
    "e5_incremental_rollup" -> hourlyRollupSql,
    "e2_user_sessions" -> userSessionsSql,
    "e3_user_type_pivot" -> userTypePivotSql,
    "e4_props_extract" -> propsExtractSql)
}
