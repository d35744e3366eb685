package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Skew

/** Sketch-based aggregation surface (SURVEY §7.1 step 8's
  * `approx_count_distinct`-class): HLL cardinalities next to their exact
  * counts. The two engines run DIFFERENT sketch implementations, so the
  * oracle-comparable output is the exact count plus a within-tolerance
  * boolean — each engine's estimate must land within 10% of truth (HLL at
  * these cardinalities is well inside that; the check is deterministic for
  * a fixed dataset, not flaky).
  */
object Sketches {

  private val Tolerance = 0.10

  def sketchDistinct(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def one(name: String, df: DataFrame, c: String): DataFrame =
      df.agg(
        countDistinct(col(c)).as("exact_n"),
        approx_count_distinct(col(c)).as("approx_n"))
        .select(
          lit(name).as("key"),
          col("exact_n"),
          (abs(col("approx_n") - col("exact_n")).cast("double") / col("exact_n")
            <= Tolerance).as("approx_ok"))
    one("l_partkey", t.lineitem, "l_partkey")
      .unionAll(one("o_custkey", t.orders, "o_custkey"))
      .unionAll(one("user_id", t.events, "user_id"))
      .orderBy("key")
  }

  val sketchDistinctSql: String =
    s"""SELECT 'l_partkey' AS key, count(DISTINCT l_partkey) AS exact_n,
       |  abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey)) * 1.0
       |    / count(DISTINCT l_partkey) <= $Tolerance AS approx_ok
       |FROM lineitem
       |UNION ALL
       |SELECT 'o_custkey', count(DISTINCT o_custkey),
       |  abs(approx_count_distinct(o_custkey) - count(DISTINCT o_custkey)) * 1.0
       |    / count(DISTINCT o_custkey) <= $Tolerance
       |FROM orders
       |UNION ALL
       |SELECT 'user_id', count(DISTINCT user_id),
       |  abs(approx_count_distinct(user_id) - count(DISTINCT user_id)) * 1.0
       |    / count(DISTINCT user_id) <= $Tolerance
       |FROM events
       |ORDER BY key""".stripMargin

  /** Two-phase salted aggregation over the MOST skewed grouping in the
    * schema (3 return flags across the whole lineitem table): must equal
    * the plain GROUP BY — the oracle is the unsalted formulation, so the
    * salting is proven result-invariant, not just plausible.
    */
  def saltedRollup(spark: SparkSession, dir: String): DataFrame =
    Skew.saltedSum(
      Tables(spark, dir).lineitem.select("l_returnflag", "l_quantity"),
      keys = Seq("l_returnflag"), value = "l_quantity",
      saltBuckets = 32, resultName = "sum_qty")
      .select(col("l_returnflag"), round(col("sum_qty"), 2).as("sum_qty"))
      .orderBy("l_returnflag")

  val saltedRollupSql: String =
    """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Bucket fan-out per refinement pass of the exact-quantile distributed
    * selection, and the span size at which the search stops refining and
    * collects the span's raw values. Both bound driver-side metadata: a
    * pass collects ≤ tasks·[[SelBuckets]] histogram rows, the final step
    * ≤ tasks·[[SelCollectAt]] values — constants, never corpus-sized.
    */
  private val SelBuckets = 4096
  private val SelCollectAt = 8192

  /** Driver-side row budget per selection pass. A refinement pass
    * collects ≤ |tasks|·buckets histogram rows and tasks can reach
    * 6·|groups|, so at high group cardinality the full [[SelBuckets]]
    * fan-out would make one pass's collect |groups|·24k rows. Instead the
    * per-pass bucket count shrinks to keep |tasks|·buckets ≤ this budget
    * (floor 2 — beyond budget/2 open tasks the floor wins and the pass
    * degrades gracefully to 2·|tasks| rows, the same |groups|-shaped
    * order as the unavoidable stats pass, never corpus-sized);
    * convergence then just takes more, still scan-shaped, passes. The
    * budget also gates the COLLECT-vs-REFINE decision: spans small
    * enough to collect individually still refine while their unresolved
    * TOTAL exceeds the budget (the many-small-groups regime, where
    * collecting would move ~the whole corpus through the driver), so the
    * terminal collect always lands ≤ ~budget values — chunked by the
    * spans' known sizes as a backstop.
    */
  private val SelDriverBudget = 1 << 20

  /** One order statistic being located by [[groupQuantilesExact]]: group
    * key and global 0-based rank; the value span [lo, hi] (inclusive)
    * known to contain it; `below` = exact count of group rows with value
    * < lo; `inSpan` = exact count of rows in the span; `value` once found.
    */
  private final case class SelCand(key: String, rank: Long, lo: Double,
      hi: Double, below: Long, inSpan: Long, value: Option[Double])

  /** A refinement task: one (group, value-span) the next scan histograms.
    * Tasks are disjoint within a group (overlapping candidate spans are
    * merged), so a row routes to at most one task.
    */
  private[queries] final case class SelTask(key: String, lo: Double, hi: Double)

  /** Task count above which row→task routing switches from inlined CASE
    * chains to a broadcast hash join. Both were measured at x100 (60M
    * rows, 3 tasks): the CASE pass costs 2.4 s, the join pass 8.7 s —
    * ~100 ns/row for the string hash probe and the wider joined rows —
    * so few-task passes (the common case: one task per group, few
    * groups) inline. But CASE depth grows linearly with |tasks| and
    * falls out of codegen (then out of the JVM's method limits) at high
    * group cardinality, where the join's cost is flat — so many-task
    * passes join. 64 is far below any codegen cliff and far above any
    * fixture; both arms share one bucket expression and are gated by the
    * same spec.
    */
  private val SelInlineTasks = 64

  /** Clamped monotone bucket index for a span: `floor((v - lo)/w)` when
    * the width is positive AND finite; otherwise a two-way split at the
    * overflow-safe midpoint `lo/2 + hi/2`. The midpoint regime covers the
    * two degenerate widths a legal double span can produce:
    *
    *  - `w = Infinity` (the span exceeds ~1.8e308, so `hi - lo`
    *    overflows): one midpoint split lands both halves back in the
    *    finite regime — the old `floor((v-lo)/w)` form put every row in
    *    bucket 0 with an unshrunk span and burned the pass guard;
    *  - `w = 0` (the span is narrower than one representable step per
    *    bucket): the midpoint halves the span's DISTINCT VALUES per pass
    *    (ulps are uniform at subnormal magnitudes) — the old `v < hi`
    *    split shed only the top value per pass, tripping the guard on
    *    spans with more distinct values than the guard allowed passes.
    *
    * When rounding pushes the midpoint out of (lo, hi], the split falls
    * back to −MaxValue for a −Infinity lower endpoint (isolating the
    * −Inf rows in one pass; a +Inf upper endpoint already lands on the
    * `mid0 <= hi` branch and splits off in one pass) and to `hi` for the
    * remaining case (adjacent subnormals — at most two values left,
    * still strictly separated). In both routing regimes the guard is
    * free on the hot path: inline tasks pass w as a literal, so Catalyst
    * constant-folds the dead branch away.
    */
  private def selBucket(v: org.apache.spark.sql.Column,
      lo: org.apache.spark.sql.Column, hi: org.apache.spark.sql.Column,
      w: org.apache.spark.sql.Column, buckets: Int): org.apache.spark.sql.Column = {
    val mid0 = lo / 2 + hi / 2
    val mid = when(mid0 > lo && mid0 <= hi, mid0)
      .otherwise(when(lo === lit(Double.NegativeInfinity),
        lit(-Double.MaxValue)).otherwise(hi))
    when(w > 0 && w < lit(Double.PositiveInfinity),
      least(greatest(floor((v - lo) / w), lit(0L)), lit(buckets - 1L)))
      .otherwise(when(v < mid, lit(0L)).otherwise(lit(1L)))
  }

  /** Row→task routing for the INLINE regime (≤ [[SelInlineTasks]]): the
    * task id as one CASE chain over per-task literal predicates — the
    * cheapest per-row form, everything folded into whole-stage codegen.
    */
  private def selInlineTaskId(keyCol: String, valCol: String,
      tasks: Seq[SelTask]): org.apache.spark.sql.Column = {
    val v = col(valCol)
    tasks.zipWithIndex.foldLeft(lit(-1)) { case (e, (t, i)) =>
      when(col(keyCol) === t.key && v >= t.lo && v <= t.hi, lit(i)).otherwise(e)
    }
  }

  /** Row→task routing for the JOIN regime (> [[SelInlineTasks]]): a
    * broadcast hash join against the tiny task table — constant
    * expression depth at any group cardinality (the task table is ≤
    * 6·|groups| rows, the driver-metadata class this file already
    * broadcasts everywhere), at ~100 ns/row more than the inline form
    * for the string hash probe and the wider joined rows (measured at
    * x100: 2.4 s vs 8.7 s per pass), which is why few-task passes inline.
    */
  private def selJoinRouted(df: DataFrame, keyCol: String, valCol: String,
      tasks: Seq[SelTask], buckets: Int): DataFrame = {
    import df.sparkSession.implicits._
    val taskDf = tasks.zipWithIndex.map { case (t, i) =>
      (i, t.key, t.lo, t.hi, (t.hi - t.lo) / buckets)
    }.toDF("__task", "__key", "__lo", "__hi", "__w")
    df.select(col(keyCol), col(valCol))
      .join(broadcast(taskDf), col(keyCol) === col("__key") &&
        col(valCol) >= col("__lo") && col(valCol) <= col("__hi"))
  }

  /** One refinement pass of [[groupQuantilesExact]] as a DataFrame —
    * factored so the spec can pin its shape: per (task, bucket), the row
    * count and the EXACT min/max value in the bucket. One scan, a partial
    * hash aggregate over ≤ tasks·buckets groups — NO window and NO sort:
    * the plan shape that replaces the per-group single-partition sort.
    * Because [[selBucket]] is monotone in v, each bucket's rows form a
    * contiguous value range, so a bucket's [min, max] is a valid (and
    * tighter) span for the next pass.
    */
  private[queries] def selHistogramFrame(df: DataFrame, keyCol: String,
      valCol: String, tasks: Seq[SelTask], buckets: Int): DataFrame = {
    val v = col(valCol)
    val routed =
      if (tasks.size <= SelInlineTasks) {
        // bucket as a second CASE chain with per-task LITERAL lo/w —
        // matching the task-id chain, nothing but the two chains per row
        val bucket = tasks.zipWithIndex.foldLeft(lit(-1L)) { case (e, (t, i)) =>
          val w = (t.hi - t.lo) / buckets
          when(col("__task") === i,
            selBucket(v, lit(t.lo), lit(t.hi), lit(w), buckets)).otherwise(e)
        }
        df.select(col(keyCol), v)
          .withColumn("__task", selInlineTaskId(keyCol, valCol, tasks))
          .filter(col("__task") >= 0)
          .withColumn("__bucket", bucket)
      } else
        selJoinRouted(df, keyCol, valCol, tasks, buckets)
          .withColumn("__bucket",
            selBucket(v, col("__lo"), col("__hi"), col("__w"), buckets))
    routed
      .groupBy("__task", "__bucket")
      .agg(count(lit(1)).as("cnt"), min(v).as("mn"), max(v).as("mx"))
  }

  /** The terminal pass of [[groupQuantilesExact]]: the raw values of the
    * remaining (small) spans, to be order-statistic-indexed driver-side.
    * Also window- and sort-free; the collect is bounded by construction
    * (every span holds ≤ [[SelCollectAt]] rows per merged candidate).
    */
  private[queries] def selCollectFrame(df: DataFrame, keyCol: String,
      valCol: String, tasks: Seq[SelTask]): DataFrame = {
    val routed =
      if (tasks.size <= SelInlineTasks)
        df.select(col(keyCol), col(valCol))
          .withColumn("__task", selInlineTaskId(keyCol, valCol, tasks))
          .filter(col("__task") >= 0)
      else selJoinRouted(df, keyCol, valCol, tasks, buckets = 2)
    routed.select(col("__task"), col(valCol).cast("double").as("__v"))
  }

  /** Merge the open candidates' spans into per-group DISJOINT tasks
    * (chain-overlapping spans union into one interval) and return the
    * tasks with their exact below-count plus candidate→task assignment
    * keyed by (group, rank). The merged task's `below` is the min-lo
    * member's `below` — both count rows strictly under the same bound.
    */
  private def selMergeTasks(open: Seq[SelCand])
      : (IndexedSeq[(SelTask, Long)], Map[(String, Long), Int]) = {
    val tasks = IndexedSeq.newBuilder[(SelTask, Long)]
    val assign = Map.newBuilder[(String, Long), Int]
    var n = 0
    open.groupBy(_.key).toSeq.sortBy(_._1).foreach { case (_, cs) =>
      val sorted = cs.sortBy(c => (c.lo, c.hi))
      var members = List(sorted.head)
      var (lo, hi, below) = (sorted.head.lo, sorted.head.hi, sorted.head.below)
      def flush(): Unit = {
        tasks += ((SelTask(members.head.key, lo, hi), below))
        members.foreach(c => assign += ((c.key, c.rank) -> n))
        n += 1; members = Nil
      }
      sorted.tail.foreach { c =>
        if (c.lo <= hi) { hi = math.max(hi, c.hi); members ::= c }
        else { flush(); members = List(c); lo = c.lo; hi = c.hi; below = c.below }
      }
      flush()
    }
    (tasks.result(), assign.result())
  }

  /** EXACT per-group order statistics by DISTRIBUTED SELECTION — the
    * scale-shaped plan for exact quantiles, usable as a generic operator
    * over any (group, double) frame. The result is a driver-side REPORT
    * by contract (|groups|·|ps| values — group-quantile summaries are
    * metadata-sized; the corpus itself never moves to the driver, see the
    * budget notes below). No per-group sort exists anywhere: each pass is
    * a scan-shaped partial aggregate, and the rank search narrows
    * geometrically. Measured at 19,990 groups × 3 percentiles over 60M
    * rows: 20.6 s (SCALESTRESS_r13 z3g), a configuration the per-group
    * sort plan cannot run at all.
    *
    *  - Pass 0: per-group `count/min/max` (one scan).
    *  - Refine: histogram the candidate spans into [[SelBuckets]] buckets
    *    ([[selHistogramFrame]] — count + exact min/max per bucket, one
    *    scan for ALL groups and percentiles together), locate the bucket
    *    holding each target rank from the cumulative counts, and shrink
    *    that candidate's span to the bucket's [min, max]. A span whose
    *    min == max IS the order statistic (any number of duplicates
    *    collapses to one bucket but resolves immediately — heavy-duplicate
    *    distributions terminate fast, not slowly).
    *  - Finish: when every remaining span holds ≤ [[SelCollectAt]] rows
    *    AND their total fits the driver budget, one final scan collects
    *    the remaining spans' values and indexes the exact rank
    *    driver-side ([[selCollectFrame]]). While the total would NOT fit
    *    (many small groups), refinement continues instead — every span
    *    resolves distributively once its bucket collapses to one distinct
    *    value, so that regime costs ~log(groupRows) shared scans and
    *    never a corpus-sized driver transfer.
    *
    * Passes = 2 + ceil(log_[[SelBuckets]](maxGroupRows / [[SelCollectAt]]))
    * full scans — 3 at sf0.1·x100, 4–5 at 100 TB — each one
    * whole-stage-codegen'd scan + tiny exchange (≤ tasks·buckets partial
    * rows), vs the old plan's ONE reducer per group sorting the whole
    * group (the r11 scale study measured that at 84.6 s / x100,
    * superlinear; this plan is scan-bound). Driver state is bounded:
    * |groups| stats rows, ≤ 6·|groups| candidates, and ≤ ~`driverBudget`
    * rows per pass — the per-pass bucket fan-out shrinks as the open-task
    * count grows and the terminal collect chunks, so high group
    * cardinality costs extra passes, not driver memory (see
    * [[SelDriverBudget]]). Degenerate double spans are legal inputs: a
    * span whose width overflows (±~1.8e308 in one group) or underflows
    * below one representable step per bucket routes through
    * [[selBucket]]'s midpoint split and still converges — progress is
    * asserted every pass. ±Infinity VALUES are legal and rank at the
    * ends like SQL ORDER BY; NaN values are rejected up front with a
    * contract error (engines disagree on NaN rank order).
    * Returns, per group, the interpolated value
    * per requested percentile (`quantile_cont` semantics: v = v_floor +
    * frac·(v_ceil − v_floor) at pos = (n−1)·p). Null values are ignored
    * (SQL aggregate semantics); null group keys are rejected loudly at
    * entry (the task routing is equality-based, which never matches null).
    */
  def groupQuantilesExact(df0: DataFrame, keyCol: String,
      valCol: String, ps: Seq[Double], buckets: Int = SelBuckets,
      collectAt: Int = SelCollectAt,
      driverBudget: Int = SelDriverBudget): Map[String, Seq[Double]] = {
    val df = df0.select(col(keyCol).cast("string").as(keyCol),
      col(valCol).cast("double").as(valCol))
      .filter(col(valCol).isNotNull)
    val stats = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), min(col(valCol)).as("mn"),
        max(col(valCol)).as("mx"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // reject null GROUP KEYS up front with the same loud contract the NaN
    // check below gets: a null key would flow into the stats map and then
    // never match the inline CASE routing (col === key is never true for
    // null), surfacing passes later as a baffling "rank missing from its
    // histogram" — not as the contract error it is. SQL-GROUP-BY-style
    // null-group support would need null-safe (<=>) routing throughout.
    require(!stats.contains(null),
      s"$keyCol contains null group keys: groupQuantilesExact routes " +
        "refinement tasks by key equality, which never matches null - " +
        "filter or coalesce null keys upstream")
    // reject NaN up front with a clear contract error: engines disagree on
    // NaN rank order, and driver-side NaN != NaN would otherwise surface
    // as a baffling progress-stall failure deep in the refinement.
    // ±Infinity VALUES are legal and rank at the ends, like SQL ORDER BY.
    stats.find { case (_, (_, mn, mx)) => mn.isNaN || mx.isNaN }
      .foreach { case (key, _) =>
        throw new IllegalArgumentException(
          s"group $key contains NaN values: NaN has no defined quantile " +
            "rank (filter NaN upstream)")
      }
    var cands: Seq[SelCand] = stats.toSeq.flatMap { case (key, (n, mn, mx)) =>
      ps.flatMap { p =>
        val pos = (n - 1) * p
        Seq(math.floor(pos).toLong, math.ceil(pos).toLong)
      }.distinct.map(r =>
        SelCand(key, r, mn, mx, 0L, n, if (mn == mx) Some(mn) else None))
    }
    // which open candidates the next pass must refine: any span too big
    // to collect on its own, and — the MANY-SMALL-GROUPS regime — every
    // open span when the unresolved TOTAL would blow the terminal-collect
    // budget (collecting would move ~the whole corpus through the driver
    // in budget-sized chunks; refining instead resolves every span
    // distributively via mn==mx in ~log_eff(groupRows) shared scans)
    def needingRefine(cs: Seq[SelCand]): Seq[SelCand] = {
      val open = cs.filter(_.value.isEmpty)
      // the true row total of a terminal collect: per-group spans are
      // identical-or-disjoint, so counting each distinct span once is
      // exact — summing raw candidates would count a group's shared span
      // up to 2·|ps| times and force needless extra full scans
      val totalOver = open.groupBy(c => (c.key, c.lo, c.hi))
        .values.map(_.head.inSpan).sum > driverBudget
      open.filter(c => c.inSpan > collectAt || totalOver)
    }
    var pass = 0
    var open = needingRefine(cands)
    while (open.nonEmpty) {
      pass += 1
      // progress is STRUCTURAL, asserted per pass below (every split
      // excludes at least one attained endpoint value, so each open span
      // strictly shrinks); this cap is a pure backstop, sized to cover
      // even the floor-width regime (two-way splits need ~2100 numeric
      // halvings to cross the entire double range) with margin
      require(pass <= 4096, "distributed quantile selection failed to converge")
      val (tasks, assign) = selMergeTasks(open)
      // per-pass fan-out shrinks with the open-task count so one pass
      // never collects more than ~driverBudget histogram rows
      val eff = math.max(2, math.min(buckets,
        driverBudget / math.max(1, tasks.size)))
      val before = open.map(c => (c.key, c.rank) -> c).toMap
      val hist = selHistogramFrame(df, keyCol, valCol, tasks.map(_._1), eff)
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) ->
          (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      val byTask = hist.groupBy(_._1._1).map { case (t, rows) =>
        t -> rows.map { case ((_, b), v) => (b, v) }.sortBy(_._1).toSeq
      }
      cands = cands.map { c =>
        if (c.value.nonEmpty || !assign.contains((c.key, c.rank))) c
        else {
          val t = assign((c.key, c.rank))
          var acc = tasks(t)._2 // rows in the group below the task span
          var found: Option[SelCand] = None
          byTask(t).iterator.takeWhile(_ => found.isEmpty).foreach {
            case (_, (cnt, mn, mx)) =>
              if (acc + cnt > c.rank)
                found = Some(c.copy(lo = mn, hi = mx, below = acc,
                  inSpan = cnt, value = if (mn == mx) Some(mn) else None))
              else acc += cnt
          }
          found.getOrElse(throw new IllegalStateException(
            s"rank ${c.rank} of group ${c.key} missing from its histogram"))
        }
      }
      // the structural-progress guarantee the pass cap leans on: a stall
      // (same span, same row count) fails THIS pass loudly instead of
      // burning thousands of full scans first
      for (c <- cands; o <- before.get((c.key, c.rank)) if c.value.isEmpty)
        require(c.lo > o.lo || c.hi < o.hi || c.inSpan < o.inSpan,
          s"quantile selection made no progress on group ${c.key} rank " +
            s"${c.rank}: span [${c.lo}, ${c.hi}] holding ${c.inSpan} rows")
      open = needingRefine(cands)
    }
    val remaining = cands.filter(_.value.isEmpty)
    if (remaining.nonEmpty) {
      val (tasks, assign) = selMergeTasks(remaining)
      // the refine loop exits with the unresolved TOTAL ≤ driverBudget,
      // so this usually fits one collect; chunk by the tasks' known span
      // sizes as a backstop (extra scans, never extra driver memory)
      val taskRows = remaining.groupBy(c => assign((c.key, c.rank)))
        .map { case (t, cs) => t -> cs.map(_.inSpan).max }
      val chunks = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer.empty[(SelTask, Int)])
      var acc = 0L
      for ((t, i) <- tasks.map(_._1).zipWithIndex) {
        if (acc + taskRows(i) > driverBudget && chunks.last.nonEmpty) {
          chunks += scala.collection.mutable.ArrayBuffer.empty; acc = 0L
        }
        chunks.last += ((t, i)); acc += taskRows(i)
      }
      val byTask = chunks.iterator.filter(_.nonEmpty).flatMap { chunk =>
        selCollectFrame(df, keyCol, valCol, chunk.map(_._1).toSeq)
          .collect()
          .map(r => (chunk(r.getInt(0))._2, r.getDouble(1)))
      }.toSeq
        .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).sorted }
      cands = cands.map { c =>
        if (c.value.nonEmpty) c
        else {
          val t = assign((c.key, c.rank))
          c.copy(value = Some(byTask(t)((c.rank - tasks(t)._2).toInt)))
        }
      }
    }
    val at = cands.map(c => (c.key, c.rank) -> c.value.get).toMap
    stats.map { case (key, (n, _, _)) =>
      key -> ps.map { p =>
        val pos = (n - 1) * p
        val lo = at((key, math.floor(pos).toLong))
        val hi = at((key, math.ceil(pos).toLong))
        // infinities short-circuit the lerp: equal endpoints give
        // Inf − Inf = NaN, and a −Inf floor gives −Inf + frac·Inf = NaN —
        // the continuity limit of interpolating FROM −Inf is −Inf (a
        // finite floor against a +Inf ceil already yields +Inf correctly)
        if (lo == hi || lo.isNegInfinity) lo
        else lo + (pos - math.floor(pos)) * (hi - lo)
      }
    }
  }

  /** Exact interpolated percentiles per group (the distribution-shape
    * counterpart of z1's cardinalities), via [[groupQuantilesExact]]'s
    * distributed selection. The previous plan (row_number over a
    * per-group sort) put each group in ONE sort partition — 20M rows per
    * task at x100 and 84.6 s, superlinear, in the r11 scale study — while
    * this one is 3 scan-shaped passes with no window and no sort (the
    * x100 A/B is in SCALESTRESS_r12/SCALING.md). Same answers on the
    * UNCHANGED oracle SQL: `quantile_cont` interpolation, rounded to 4.
    */
  def priceQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val ps = Seq(0.5, 0.9, 0.99)
    val q = groupQuantilesExact(
      Tables(spark, dir).lineitem.select(col("l_returnflag"), col("l_extendedprice")),
      "l_returnflag", "l_extendedprice", ps)
    import spark.implicits._
    q.toSeq.map { case (f, vs) => (f, vs(0), vs(1), vs(2)) }
      .toDF("l_returnflag", "p50", "p90", "p99")
      .select(col("l_returnflag"), round(col("p50"), 4).as("p50"),
        round(col("p90"), 4).as("p90"), round(col("p99"), 4).as("p99"))
      .orderBy("l_returnflag")
  }

  val priceQuantilesSql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
      |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Rank tolerance for z3b's guarantee check, as a fraction of the group
    * size. Spark's sketch at accuracy 10000 guarantees rank error ≤ n/10000;
    * DuckDB's t-digest has no hard bound but is far inside 1% at these
    * sizes. 1% is loose enough to be deterministic for both engines on a
    * fixed dataset and tight enough that a broken sketch (or a value from
    * the wrong group) fails the gate.
    */
  private val QuantileRankTol = 0.01

  /** z3b: the ONE-PASS quantile path — mergeable `approx_percentile`
    * sketches (bounded memory, partial-aggregable, no per-group global
    * sort). Since round 12 the exact z3 is itself scale-shaped
    * ([[groupQuantilesExact]]) and usually faster, so this survives as
    * the complement, not the escape hatch: one scan plus a recount where
    * the selection pays 3+ scans (the cold-object-storage regime), and a
    * mergeable partial that can live INSIDE a streaming aggregation,
    * which a multi-pass selection cannot.
    * The two engines run DIFFERENT sketch algorithms (Greenwald–Khanna vs
    * t-digest), so — exactly like z1's HLL row — the oracle-comparable
    * output is the exact group count plus a computed GUARANTEE check: the
    * returned value's exact rank interval [#(<v)+1, #(≤v)] must overlap the
    * target rank p·n ± [[QuantileRankTol]]·n. Each engine validates its own
    * sketch against the same exact recount; approximate VALUES are never
    * hash-compared (definitionally unavailable for order-dependent
    * sketches). Cost: one sketch pass + one literal-predicate recount
    * pass that stays in whole-stage codegen.
    */
  def priceQuantilesApprox(spark: SparkSession, dir: String): DataFrame = {
    val acc = 10000
    val ps = Seq(0.5, 0.9, 0.99)
    val li = Tables(spark, dir).lineitem
      .select(col("l_returnflag"), col("l_extendedprice"))
    // Pass 1: one mergeable sketch per group. Collected to the driver as
    // BOUNDED metadata — |return flags| rows × 3 doubles — so pass 2 can
    // recount the candidates as pure literals. (Bench note: the fixture
    // table is ONE parquet row group, an unsplittable single scan task,
    // which serializes the sketch's insert loop onto one core — the
    // measured ~0.45 s floor of this entry. Repartitioning first was
    // tried and LOSES: the exchange costs more than the insert loop, and
    // a wide split makes the single-threaded final merge of fat GK
    // summaries the new bottleneck. A 100 TB table has thousands of
    // row-group splits, so the partial-agg tree gets its parallelism from
    // the scan itself.)
    val cand: Map[String, Seq[Double]] =
      li.groupBy("l_returnflag").agg(
        expr(s"approx_percentile(l_extendedprice, array(${ps.mkString(", ")}), $acc)")
          .as("qs"))
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toSeq).toMap
    quantileRankCheck(li, cand, ps)
  }

  /** Pass 2 of [[priceQuantilesApprox]], factored so the spec can feed it
    * WRONG candidates: exact rank recount of the candidate values as
    * when-sums over one scan — fully codegen'd, no join, no second shuffle
    * stage — and the rank-interval verdicts. The check must be falsifiable
    * (SketchSamplingSpec corrupts a candidate and asserts `false` comes
    * out), or the all-true oracle would be a tautology.
    */
  private[queries] def quantileRankCheck(li: DataFrame,
      cand: Map[String, Seq[Double]], ps: Seq[Double]): DataFrame = {
    // per-percentile candidate value as a flag→literal CASE expression
    def vOf(pi: Int) = cand.foldLeft(lit(null).cast("double")) {
      case (e, (flag, qs)) => when(col("l_returnflag") === flag, lit(qs(pi))).otherwise(e)
    }
    val aggs = ps.indices.flatMap { pi => Seq(
      sum(when(col("l_extendedprice") < vOf(pi), 1L).otherwise(0L)).as(s"lo$pi"),
      sum(when(col("l_extendedprice") <= vOf(pi), 1L).otherwise(0L)).as(s"hi$pi"))
    }
    val counted = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), aggs: _*)
    def okOf(pi: Int) = {
      val target = lit(ps(pi)) * col("n")
      val tol = lit(QuantileRankTol) * col("n")
      (col(s"lo$pi") + 1 <= target + tol) && (col(s"hi$pi") >= target - tol)
    }
    counted.select(col("l_returnflag"), col("n"),
      okOf(0).as("p50_ok"), okOf(1).as("p90_ok"), okOf(2).as("p99_ok"))
      .orderBy("l_returnflag")
  }

  val priceQuantilesApproxSql: String = {
    def ok(v: String, p: Double): String =
      s"""(sum(CASE WHEN li.l_extendedprice < s.$v THEN 1 ELSE 0 END) + 1
         |      <= $p * s.n + $QuantileRankTol * s.n
         |    AND sum(CASE WHEN li.l_extendedprice <= s.$v THEN 1 ELSE 0 END)
         |      >= $p * s.n - $QuantileRankTol * s.n)""".stripMargin
    s"""WITH sk AS (
       |  SELECT l_returnflag, count(*) AS n,
       |    approx_quantile(l_extendedprice, 0.5) AS v50,
       |    approx_quantile(l_extendedprice, 0.9) AS v90,
       |    approx_quantile(l_extendedprice, 0.99) AS v99
       |  FROM lineitem GROUP BY l_returnflag)
       |SELECT s.l_returnflag, s.n,
       |  ${ok("v50", 0.5)} AS p50_ok,
       |  ${ok("v90", 0.9)} AS p90_ok,
       |  ${ok("v99", 0.99)} AS p99_ok
       |FROM sk s JOIN lineitem li USING (l_returnflag)
       |GROUP BY s.l_returnflag, s.n
       |ORDER BY s.l_returnflag""".stripMargin
  }

  /** Misra–Gries counter budget per partition; the heavy-hitter threshold
    * is relative — freq ≥ total/HhK (0.5% of the token stream) — so the
    * candidate guarantee holds at every corpus size with the same k.
    */
  val HhK = 200

  /** EXACT heavy hitters over the corpus token stream, two passes:
    * (1) a per-partition Misra–Gries sketch (k = [[HhK]] counters) emits
    * candidate tokens plus the partition's token count; (2) an exact
    * recount of ONLY the candidates, kept iff cnt·k ≥ total. MG can
    * undercount but never evicts a token with partition-frequency ≥ n_p/k,
    * and freq ≥ total/k globally implies ≥ n_p/k in some partition
    * (pigeonhole) — so candidates ⊇ true heavy hitters and the exact
    * recount makes the output EXACT: independent of partitioning, task
    * order, and k (k only prices the prune). That is what makes a plain
    * `GROUP BY token HAVING cnt·k ≥ total` the oracle.
    *
    * Scale shape (Misra/Gries 1982; the streaming classic): pass 1 shuffles
    * NOTHING and collects ≤ (k+1)·partitions tiny rows — candidate tokens
    * and per-partition totals are driver-side metadata, same class as the
    * export manifest — while pass 2 shuffles only candidate-token rows
    * (≤ k·partitions distinct keys), not the full Zipf vocabulary. At a
    * trillion-token corpus the naive groupBy ships every distinct token
    * through the exchange; this ships ~10⁴. The candidate union
    * aggregates DISTRIBUTED before the collect — one tiny exchange of
    * ≤ (k+1)·partitions summary rows whose map side combines — so the
    * driver receives ≤ |distinct candidates|+1 rows, bounded by the true
    * union even at extreme partition counts (a naive `distinct()` would
    * instead merge two partitions' equal (null, n) total rows and
    * undercount; summing per token is the correct MG summary merge).
    */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame =
    heavyHittersOf(Tables(spark, dir).documents, HhK)

  /** [[heavyHitters]] over any (text) frame with an explicit counter
    * budget — the spec drives it at several parallelisms and k's and
    * asserts the output never moves.
    */
  def heavyHittersOf(docs: DataFrame, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    // pass 1: per-partition MG candidates + partition token counts.
    // Emitted as (token|null, n) rows: null carries the count — retry-safe
    // (a re-run task re-emits the same rows), unlike an accumulator.
    val partial = toks.as[String].mapPartitions { it =>
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      var n = 0L
      it.foreach { t =>
        n += 1
        counts.get(t) match {
          case Some(c) => counts.update(t, c + 1)
          case None if counts.size < k => counts.update(t, 1L)
          case None => // decrement-all, drop zeros: the MG eviction step
            counts.keys.toArray.foreach { tok =>
              val c = counts(tok) - 1
              if (c == 0) counts.remove(tok) else counts.update(tok, c)
            }
        }
      }
      Iterator.single((null: String, n)) ++ counts.keysIterator.map((_, 0L))
    }.toDF("token", "n")
      // distributed union of the per-partition summaries: sum-by-token is
      // the MG merge (null totals add, candidate dups collapse), so the
      // collect is ≤ |distinct candidates|+1 rows at ANY partition count
      .groupBy("token").agg(sum("n").as("n"))
      .collect()
    val total = partial.filter(_.isNullAt(0)).map(_.getLong(1)).sum
    val cands = partial.filter(!_.isNullAt(0)).map(_.getString(0)).toSeq
    // pass 2: exact recount of candidates only
    toks.join(broadcast(cands.toDF("token")), "token")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k >= total)
      .orderBy(desc("cnt"), asc("token"))
  }

  /** The SQL twin at an arbitrary budget — the scale study grows k with
    * the corpus (threshold total/k stays a fixed per-replica share), so
    * the oracle must too.
    */
  def heavyHittersSqlFor(k: Int): String =
    s"""WITH raw AS (
       |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
       |toks AS (SELECT token FROM raw WHERE len(token) > 0),
       |tot AS (SELECT count(*) AS n FROM toks)
       |SELECT token, count(*) AS cnt
       |FROM toks, tot
       |GROUP BY token, tot.n
       |HAVING count(*) * $k >= tot.n
       |ORDER BY cnt DESC, token""".stripMargin

  val heavyHittersSql: String = heavyHittersSqlFor(HhK)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "z1_sketch_distinct" -> (sketchDistinct _),
    "z2_salted_rollup" -> (saltedRollup _),
    "z3_price_quantiles" -> (priceQuantiles _),
    "z3b_price_quantiles_approx" -> (priceQuantilesApprox _),
    "z4_heavy_hitters" -> (heavyHitters _))

  val oracles: Map[String, String] = Map(
    "z1_sketch_distinct" -> sketchDistinctSql,
    "z2_salted_rollup" -> saltedRollupSql,
    "z3_price_quantiles" -> priceQuantilesSql,
    "z3b_price_quantiles_approx" -> priceQuantilesApproxSql,
    "z4_heavy_hitters" -> heavyHittersSql)
}
