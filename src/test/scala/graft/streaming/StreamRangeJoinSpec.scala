package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase
import graft.queries.Temporal

/** Contracts for st10, the stream-stream bounded-range join: the replayed
  * pair stream must equal the batch bucket join (j2) under multi-batch and
  * out-of-order replay, the executed plan must be Spark's symmetric hash
  * join on the bucket key (state partitioned by key — never a nested loop
  * over two unbounded streams), and the watermark must observably EVICT
  * join state during a long replay (the bounded-state claim, st6b-style).
  */
class StreamRangeJoinSpec extends SparkTestBase {

  // sf0.001 has ZERO within-60s purchase-error pairs — the equality would
  // pass vacuously; sf0.01's 182 pairs make it a real contract
  private lazy val SfDir = testData("0.01")
  private val WindowUs = 60000000L

  private def splitZone(name: String, arrivalOrder: Seq[Int]): String = {
    val dir = scratch(name)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$SfDir/events.parquet")
      .withColumn("third", ntile(3).over(Window.orderBy("ts", "event_id")))
    arrivalOrder.zipWithIndex.foreach { case (third, i) =>
      ReplayFixtures.writeOne(ev.filter(col("third") === third).drop("third"),
        s"$dir/f$third.parquet", 1700000000000L + i * 60000L)
    }
    dir
  }

  private def streamPairs(zone: String, table: String, delay: String): DataFrame =
    EventStreams.replayToTable(
      EventStreams.rangeJoin(
        EventStreams.readEvents(spark, zone, glob = "*.parquet",
          maxFilesPerTrigger = Some(1)),
        EventStreams.readEvents(spark, zone, glob = "*.parquet",
          maxFilesPerTrigger = Some(1)),
        WindowUs, delay),
      table, OutputMode.Append())

  private def batchPairs(): Seq[(Long, Long, Long)] =
    Temporal.rangeCorrelation(spark, SfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  private def norm(df: DataFrame): Seq[(Long, Long, Long)] =
    df.select("purchase_id", "error_id", "lag_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("multi-batch replay equals the batch bucket join row-for-row") {
    val zone = splitZone("st10_chrono", Seq(1, 2, 3))
    val got = norm(streamPairs(zone, "st10_chrono_t", "40 days"))
    val want = batchPairs()
    assert(got.nonEmpty && got == want)
  }

  test("non-chronological replay still equals batch (disorder within the delay)") {
    val zone = splitZone("st10_ooo", Seq(2, 1, 3))
    val got = norm(streamPairs(zone, "st10_ooo_t", "40 days"))
    assert(got == batchPairs())
  }

  test("executes as a streaming symmetric hash join on the bucket key — no nested loop") {
    val q = EventStreams.rangeJoin(
      EventStreams.readEvents(spark, SfDir),
      EventStreams.readEvents(spark, SfDir), WindowUs)
      .writeStream.queryName("st10_plan_t").outputMode(OutputMode.Append())
      .format("memory")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    // the state operator IS the join: symmetric hash, state keyed by the
    // bucket column — the streaming analogue of the plan-shape contracts
    // PlanSpec pins for the batch tier
    val ops = q.lastProgress.stateOperators.map(_.operatorName).toSeq
    assert(ops.exists(_.toLowerCase.contains("symmetrichashjoin")),
      s"expected a symmetric hash join state operator, got $ops")
    // and the single-batch replay already equals the batch twin
    val got = norm(spark.table("st10_plan_t"))
    assert(got == batchPairs())
  }

  // ------------------------------------------------------------- st10b
  // KEYED variant: per-user pairs within 30 min (the production shape —
  // linear output, state sharded by (user, bucket) not time bucket alone)

  private val KeyedWindowUs = 1800000000L

  private def keyedBatchPairs(): Seq[(Long, Long, Long, Long)] = {
    val ev = spark.read.parquet(s"$SfDir/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("us").as("p_us"))
    val e = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"),
        col("us").as("e_us"))
    p.join(e, "user_id")
      .filter(abs(col("p_us") - col("e_us")) <= KeyedWindowUs)
      .select(col("user_id"), col("purchase_id"), col("error_id"),
        abs(col("p_us") - col("e_us")).as("lag_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._2, t._3)).toSeq
  }

  private def normKeyed(df: DataFrame): Seq[(Long, Long, Long, Long)] =
    df.select("user_id", "purchase_id", "error_id", "lag_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._2, t._3)).toSeq

  test("keyed multi-batch out-of-order replay equals the keyed batch join") {
    val zone = splitZone("st10b_ooo", Seq(2, 1, 3))
    val got = normKeyed(EventStreams.replayToTable(
      EventStreams.keyedRangeJoin(
        EventStreams.readEvents(spark, zone, glob = "*.parquet",
          maxFilesPerTrigger = Some(1)),
        EventStreams.readEvents(spark, zone, glob = "*.parquet",
          maxFilesPerTrigger = Some(1)),
        KeyedWindowUs, "40 days"),
      "st10b_ooo_t", OutputMode.Append()))
    val want = keyedBatchPairs()
    assert(got.nonEmpty && got == want)
  }

  test("keyed join still executes as a symmetric hash join (user widens the key)") {
    val q = EventStreams.keyedRangeJoin(
      EventStreams.readEvents(spark, SfDir),
      EventStreams.readEvents(spark, SfDir), KeyedWindowUs)
      .writeStream.queryName("st10b_plan_t").outputMode(OutputMode.Append())
      .format("memory")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val ops = q.lastProgress.stateOperators.map(_.operatorName).toSeq
    assert(ops.exists(_.toLowerCase.contains("symmetrichashjoin")),
      s"expected a symmetric hash join state operator, got $ops")
    assert(normKeyed(spark.table("st10b_plan_t")) == keyedBatchPairs())
  }

  test("watermark evicts join state during a chronological replay (bounded state)") {
    val zone = splitZone("st10_evict", Seq(1, 2, 3))
    val m = StreamMetrics.attach(spark)
    try {
      val got = norm(streamPairs(zone, "st10_evict_t", "2 hours"))
      // events span days; a 2h horizon with chronological thirds keeps
      // every within-60s pair intact while evicting everything older
      assert(got == batchPairs())
      val batches = m.batches.filter(_.query == "st10_evict_t")
      assert(batches.map(_.stateRowsRemoved).sum > 0,
        s"no state eviction observed: $batches")
      // final state is a horizon's worth of rows, far below total input
      val finalState = batches.lastOption.map(_.stateRowsTotal).getOrElse(0L)
      val totalInput = batches.map(_.inputRows).sum
      assert(finalState < totalInput / 2,
        s"state $finalState did not stay bounded vs input $totalInput")
    } finally m.detach()
  }
}
