package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Temporal join operators (extension tier, SURVEY §2.6 notes the reference
  * has "no theta/range/as-of joins" — these are the two shapes a
  * training-data/event pipeline actually needs, built scale-first).
  *
  * Neither is expressed as an inequality join: a naive `a.ts < b.ts` theta
  * join is a BroadcastNestedLoopJoin — O(n·m) and dead at scale. Instead:
  *  - the AS-OF join is the union-then-window formulation: one shuffle on
  *    the join key, one per-key sort, linear scan — the same plan a
  *    dedicated as-of operator would produce;
  *  - the bounded RANGE join buckets time into 2·window-width buckets and
  *    equi-joins on the bucket id (each probe row expands to its ≤2
  *    covering buckets) — the shuffle key is a small integer and the quadratic work
  *    collapses to genuinely-close pairs.
  */
object Temporal {

  // ------------------------------------------------------------------ j1

  /** AS-OF join (attribution): for each `purchase` event, the latest
    * strictly-earlier `view`/`click` by the same user. Implemented by
    * interleaving both sides into one (user_id, ts)-sorted stream and
    * carrying the last-seen trigger forward with a running window —
    * exactly one shuffle (on user_id), no inequality join anywhere.
    * Parallelism scales with the user population, and the per-user state
    * is one row. (user_id, ts) is unique in the events table, but the
    * window order does not rely on that: same-ts purchases sort BEFORE
    * same-ts triggers (a trigger at exactly the purchase's timestamp never
    * attributes — strict `<`, DuckDB ASOF semantics) and same-ts triggers
    * tie-break ascending trig_id, so `last()` picks the max — the same tie
    * rules as the streaming twin (EventStreams.attribution).
    */
  def asofAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val triggers = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("ts"),
        col("event_id").as("trig_id"), col("event_type").as("trig_type"))
    graft.operators.TemporalJoins.asOf(
        probe = purchases, build = triggers,
        keys = Seq("user_id"), tsCol = "ts",
        carry = Seq("trig_id", "trig_type", "ts"),
        strict = true, tieBreak = Seq("trig_id"))
      .select(col("purchase_id"), col("user_id"),
        col("asof_trig_id").as("attributed_id"),
        col("asof_trig_type").as("attributed_type"),
        expr("(unix_micros(ts) - unix_micros(asof_ts)) DIV 1000000")
          .as("lag_seconds"))
      .orderBy("purchase_id")
  }

  /** DuckDB states the same semantics with its native ASOF JOIN; the
    * floor-division lag matches Spark's `DIV` on the non-negative diff.
    */
  val asofAttributionSql: String =
    """SELECT p.event_id AS purchase_id, p.user_id,
      |  e.event_id AS attributed_id, e.event_type AS attributed_type,
      |  (epoch_us(p.ts) - epoch_us(e.ts)) // 1000000 AS lag_seconds
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF JOIN (SELECT * FROM events WHERE event_type IN ('view', 'click')) e
      |  ON e.user_id = p.user_id AND e.ts < p.ts
      |ORDER BY purchase_id""".stripMargin

  // ------------------------------------------------------------------ j3

  /** j1 again, through the dedicated physical operator
    * ([[graft.operators.TemporalJoins.asOfExec]] → `AsOfJoinExec`): same
    * semantics, same oracle, different plan — exchange+sort per side and a
    * single merge pass instead of union+window. Keeping both forms under
    * the gate pins that the custom exec and the declarative formulation
    * can never drift apart.
    */
  def asofAttributionExec(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val triggers = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("ts"),
        col("event_id").as("trig_id"), col("event_type").as("trig_type"))
    graft.operators.TemporalJoins.asOfExec(
        probe = purchases, build = triggers,
        keys = Seq("user_id"), tsCol = "ts",
        carry = Seq("trig_id", "trig_type", "ts"),
        strict = true, tieBreak = Seq("trig_id"))
      .select(col("purchase_id"), col("user_id"),
        col("asof_trig_id").as("attributed_id"),
        col("asof_trig_type").as("attributed_type"),
        expr("(unix_micros(ts) - unix_micros(asof_ts)) DIV 1000000")
          .as("lag_seconds"))
      .orderBy("purchase_id")
  }

  // ------------------------------------------------------------------ j2

  /** Bounded RANGE join (incident correlation): all (purchase, error) pairs
    * — across ALL users — within 60 s of each other. Bucketing argument:
    * with bucket width = the window width W, |a−b| ≤ W implies the bucket
    * ids differ by at most 1, so probing buckets {b−1, b, b+1} finds every
    * qualifying pair exactly once (each error holds ONE bucket; each
    * purchase row expands to 3). The join is a plain equi-join on a long —
    * shuffle-friendly, AQE-skew-splittable — with the exact |Δts| ≤ W
    * predicate applied after.
    *
    * Precondition: non-negative epoch timestamps. `DIV` truncates toward
    * zero, which equals the floor division the covering-bucket argument
    * needs only for ts ≥ 0 (epoch 1970+); for pre-epoch data swap in
    * `floor(e_us / W)`.
    */
  def rangeCorrelation(spark: SparkSession, dir: String): DataFrame = {
    val WindowUs = 60000000L // 60 s in microseconds
    val ev = Tables(spark, dir).events
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), unix_micros(col("ts")).as("e_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), unix_micros(col("ts")).as("p_us"))
    graft.operators.TemporalJoins.boundedRange(
        purchases, errors, leftTs = "p_us", rightTs = "e_us", window = WindowUs)
      .select(col("purchase_id"), col("error_id"),
        abs(col("p_us") - col("e_us")).as("lag_us"))
      .orderBy("purchase_id", "error_id")
  }

  /** DuckDB's IEJoin handles the inequality directly at oracle scale. */
  val rangeCorrelationSql: String =
    """SELECT p.event_id AS purchase_id, e.event_id AS error_id,
      |  abs(epoch_us(p.ts) - epoch_us(e.ts)) AS lag_us
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |JOIN (SELECT * FROM events WHERE event_type = 'error') e
      |  ON abs(epoch_us(p.ts) - epoch_us(e.ts)) <= 60000000
      |ORDER BY purchase_id, error_id""".stripMargin

  /** j5: the temporal ANTI-join — purchases with NO error within 60s
    * (the complement of j2, and the shape incident triage actually asks:
    * which operations ran CLEAN). Same covering-bucket equi-join for the
    * matching stage, matched ids distinct'd, one left-anti join back —
    * DuckDB's oracle states it as the textbook NOT EXISTS inequality.
    */
  def unmatchedPurchases(spark: SparkSession, dir: String): DataFrame = {
    val WindowUs = 60000000L
    val ev = Tables(spark, dir).events
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts"),
        unix_micros(col("ts")).as("p_us"))
    val errors = ev.filter(col("event_type") === "error")
      .select(unix_micros(col("ts")).as("e_us"))
    graft.operators.TemporalJoins.boundedRangeAnti(
        purchases, errors, leftId = "purchase_id",
        leftTs = "p_us", rightTs = "e_us", window = WindowUs)
      .select(col("purchase_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"))
      .orderBy("purchase_id")
  }

  val unmatchedPurchasesSql: String =
    """SELECT p.event_id AS purchase_id,
      |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts
      |FROM events p
      |WHERE p.event_type = 'purchase' AND NOT EXISTS (
      |  SELECT 1 FROM events e WHERE e.event_type = 'error'
      |    AND abs(epoch_us(p.ts) - epoch_us(e.ts)) <= 60000000)
      |ORDER BY purchase_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j1_asof_attribution" -> (asofAttribution _),
    "j2_range_correlation" -> (rangeCorrelation _),
    "j5_unmatched_purchases" -> (unmatchedPurchases _),
    "j3_asof_exec" -> (asofAttributionExec _))

  val oracles: Map[String, String] = Map(
    "j1_asof_attribution" -> asofAttributionSql,
    "j2_range_correlation" -> rangeCorrelationSql,
    "j5_unmatched_purchases" -> unmatchedPurchasesSql,
    // same semantics, same oracle: the exec path must match DuckDB's ASOF
    // exactly as the window formulation does
    "j3_asof_exec" -> asofAttributionSql)
}
