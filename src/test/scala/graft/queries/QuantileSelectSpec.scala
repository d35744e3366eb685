package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The z3 distributed-selection quantile plan (Sketches.groupQuantilesExact):
  * exact answers with NO per-group sort anywhere — the scale-shaped
  * replacement for the row_number-over-window plan the r11 scale study
  * measured superlinear (one sort partition per group).
  */
class QuantileSelectSpec extends SparkTestBase {

  private val Ps = Seq(0.5, 0.9, 0.99)

  /** Reference implementation: driver-side sort + quantile_cont
    * interpolation — O(n log n) on the test fixture, fine here. The
    * lo==hi short-circuit is forced arithmetic, not convention (the plain
    * formula gives Inf + 0·NaN = NaN when both endpoints are the same
    * infinity); the -Inf-endpoint INTERPOLATION convention is deliberately
    * NOT re-derived here — it is pinned by hard-coded literals in the
    * ±Infinity test, so a wrong production convention cannot hide behind
    * a reference that shares its branch.
    */
  private def expected(rows: Seq[(String, Double)],
      ps: Seq[Double]): Map[String, Seq[Double]] =
    rows.groupBy(_._1).map { case (k, vs) =>
      val s = vs.map(_._2).sorted.toIndexedSeq
      k -> ps.map { p =>
        val pos = (s.length - 1) * p
        val (lo, hi) = (s(math.floor(pos).toInt), s(math.ceil(pos).toInt))
        if (lo == hi) lo
        else lo + (pos - math.floor(pos)) * (hi - lo)
      }
    }

  private def check(rows: Seq[(String, Double)], buckets: Int,
      collectAt: Int, parts: Int = 4): Unit = {
    import spark.implicits._
    val df = rows.toDF("k", "v").repartition(parts)
    val got = Sketches.groupQuantilesExact(df, "k", "v", Ps,
      buckets = buckets, collectAt = collectAt)
    val want = expected(rows, Ps)
    assert(got.keySet === want.keySet)
    for (k <- want.keySet; i <- Ps.indices)
      assert(got(k)(i) === want(k)(i),
        s"group $k p=${Ps(i)}: got ${got(k)(i)}, want ${want(k)(i)}")
  }

  /** Deterministic pseudo-random doubles (no RNG seeding ambiguity). */
  private def synth(n: Int, salt: Int): Seq[Double] =
    (0 until n).map(i => ((i * 2654435761L + salt) % 100000) / 7.0)

  test("matches driver-side quantile_cont on mixed group sizes and duplicates") {
    val rows =
      synth(1777, 1).map("a" -> _) ++
        // heavy duplicates: 60% of group b is one repeated value
        (synth(400, 2) ++ Seq.fill(600)(42.42)).map("b" -> _) ++
        Seq("c" -> 7.5) ++ // single-row group
        Seq("d" -> 1.0, "d" -> 2.0) ++ // two-row group: pure interpolation
        Seq.fill(50)("e" -> 3.25) // all-equal group: instant resolve
    check(rows, buckets = 4096, collectAt = 8192) // one stats pass only
    check(rows, buckets = 8, collectAt = 4) // forced multi-pass refinement
    check(rows, buckets = 2, collectAt = 1) // degenerate fan-out still exact
  }

  test("result is independent of partitioning") {
    val rows = synth(3000, 9).map(v => (if (v < 5000) "x" else "y") -> v)
    Seq(1, 7, 32).foreach(p => check(rows, buckets = 16, collectAt = 8, parts = p))
  }

  test("spans narrower than one double step resolve via the w==0 split") {
    val lo = 1.0
    val hi = java.lang.Math.nextUp(lo)
    // adjacent representable doubles: (hi-lo)/buckets underflows relative
    // to lo, so the floor bucketing cannot separate them — the v < hi
    // fallback must
    val rows = (Seq.fill(700)(lo) ++ Seq.fill(300)(hi)).map("g" -> _)
    check(rows, buckets = 4, collectAt = 1)
    // subnormal magnitudes: (hi-lo)/buckets literally rounds to 0.0
    val tiny = java.lang.Double.MIN_VALUE
    assert((tiny - 0.0) / 4 === 0.0)
    check((Seq.fill(10)(0.0) ++ Seq.fill(10)(tiny)).map("s" -> _),
      buckets = 4, collectAt = 1)
  }

  test("spans whose width overflows to Infinity resolve via the midpoint split") {
    // hi - lo = Infinity: floor((v-lo)/w) used to put EVERY row in bucket
    // 0 with an unshrunk [mn,mx], burning the pass guard on legal finite
    // input; one overflow-safe midpoint split (lo/2 + hi/2) re-enters the
    // finite-width regime
    val big = 1.6e308
    val rows = (Seq.fill(40)(-big) ++ Seq.fill(40)(0.0) ++ Seq.fill(40)(big))
      .map("g" -> _) ++
      // mixed with an ordinary group: tasks of both regimes in one pass
      synth(200, 5).map("h" -> _)
    check(rows, buckets = 4, collectAt = 1)
  }

  test("w==0 spans with hundreds of distinct values converge (midpoint halves them)") {
    // 1500 distinct subnormal-spaced values: (hi-lo)/4096 rounds to 0.0,
    // and the old v < hi split shed ONE value per pass — tripping the old
    // 64-pass guard; the midpoint split halves the span's values per pass
    val tiny = java.lang.Double.MIN_VALUE
    assert((tiny * 1499 - 0.0) / 4096 === 0.0, "fixture must be in the w==0 regime")
    val rows = (0 until 1500).map(i => "s" -> tiny * i)
    check(rows, buckets = 4096, collectAt = 1)
  }

  test("per-pass driver collect respects a budget at high group cardinality") {
    // 300 groups × >collectAt rows keep ~600+ tasks open; a 256-row
    // budget forces the bucket fan-out to its floor (2) and chunks the
    // terminal collect — exactness must survive the degraded fan-out
    val rows = (0 until 12000).map(i => (s"g${i % 300}", synth(1, i * 7 + 3).head))
    import spark.implicits._
    val df = rows.toDF("k", "v").repartition(4)
    val got = Sketches.groupQuantilesExact(df, "k", "v", Ps,
      buckets = 64, collectAt = 8, driverBudget = 256)
    val want = expected(rows, Ps)
    assert(got.keySet === want.keySet)
    for (k <- want.keySet; i <- Ps.indices)
      assert(got(k)(i) === want(k)(i),
        s"group $k p=${Ps(i)}: got ${got(k)(i)}, want ${want(k)(i)}")
  }

  test("many small groups refine distributively instead of collecting the corpus") {
    // every span is under collectAt from pass 0, but the unresolved TOTAL
    // exceeds the budget: the old terminal collect would have moved all
    // rows through the driver in chunks; now the loop keeps refining and
    // each span resolves via its bucket collapsing to one distinct value
    val rows = (0 until 10000).map(i => (s"g${i % 500}", synth(1, i * 13 + 1).head))
    import spark.implicits._
    val df = rows.toDF("k", "v").repartition(4)
    val got = Sketches.groupQuantilesExact(df, "k", "v", Ps,
      buckets = 64, collectAt = 8192, driverBudget = 2048)
    val want = expected(rows, Ps)
    assert(got.keySet === want.keySet)
    for (k <- want.keySet; i <- Ps.indices)
      assert(got(k)(i) === want(k)(i),
        s"group $k p=${Ps(i)}: got ${got(k)(i)}, want ${want(k)(i)}")
  }

  test("±Infinity values are legal and rank at the ends; NaN fails the contract loudly") {
    // ±Inf endpoints defeat both width regimes (hi-lo is Inf or NaN); the
    // midpoint fallbacks isolate each infinity in one pass instead of
    // shedding one finite value per pass. n=101 keeps every target rank
    // integral so the reference needs no interpolation across ±Inf.
    val inf = Double.PositiveInfinity
    val rows = (Seq(-inf, -inf, inf, inf) ++ synth(97, 11)).map("g" -> _)
    assert(rows.size === 101)
    check(rows, buckets = 8, collectAt = 1)
    // NON-integral ranks across an infinite endpoint, pinned with
    // HARD-CODED literals (the driver-side reference deliberately does
    // not model this convention — see `expected`'s scaladoc): lerp FROM
    // -Inf is -Inf at every fraction (the continuity limit; the naive
    // formula gives -Inf+Inf=NaN), and a finite floor against a +Inf
    // ceil is +Inf at every nonzero fraction
    val two = Seq("i" -> -inf, "i" -> 5.0, "j" -> 5.0, "j" -> inf)
    val got = Sketches.groupQuantilesExact(
      { import spark.implicits._; two.toDF("k", "v") }, "k", "v",
      Seq(0.25, 0.5, 0.75))
    assert(got("i") === Seq(-inf, -inf, -inf))
    assert(got("j") === Seq(inf, inf, inf))
    // NaN: a clear up-front contract error, not a deep progress stall
    import spark.implicits._
    val bad = Seq(("a", 1.0), ("a", Double.NaN), ("a", 3.0)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Sketches.groupQuantilesExact(bad, "k", "v", Seq(0.5))
    }
    assert(e.getMessage.contains("NaN"))
  }

  test("null values are ignored like any SQL aggregate") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)))
      .toDF("k", "v")
    val got = Sketches.groupQuantilesExact(df, "k", "v", Seq(0.5))
    assert(got === Map("a" -> Seq(2.0)))
  }

  test("null group keys fail the contract loudly at entry") {
    import spark.implicits._
    // a null key used to flow into the stats map, miss the equality-based
    // CASE routing forever, and die passes later as "rank ... missing
    // from its histogram" — an oblique symptom of a contract violation
    val df = Seq((Some("a"), 1.0), (None: Option[String], 2.0),
      (Some("a"), 3.0)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Sketches.groupQuantilesExact(df, "k", "v", Seq(0.5))
    }
    assert(e.getMessage.contains("null group keys"))
  }

  /** The point of the rewrite: no WindowExec and no SortExec in any scan
    * the selection runs, and the histogram aggregates partially (map-side
    * combine) — the old plan's per-group single-partition sort is
    * structurally impossible, not just avoided on this fixture. Task
    * routing is regime-split (measured at x100: inlined CASE 2.4 s vs
    * broadcast join 8.7 s per pass, but CASE depth dies at high group
    * cardinality): few tasks inline, many tasks broadcast-join — both
    * pinned here.
    */
  test("plan: selection passes have no window, no sort, and aggregate partially") {
    import spark.implicits._
    val df = synth(500, 3).map("a" -> _).toDF("k", "v")
    // string-matched like PlanSpec: AQE's wrapper hides the tree from a
    // node collect, but the printed initial plan shows every operator
    def pin(frame: DataFrame, label: String,
        expectJoin: Boolean): String = {
      val p = frame.queryExecution.executedPlan.toString
      assert(!p.contains("Window ["), s"$label: window found\n$p")
      assert(!p.contains("Sort ["), s"$label: sort found\n$p")
      assert(p.contains("BroadcastHashJoin") === expectJoin,
        s"$label: wrong task-routing regime (expectJoin=$expectJoin)\n$p")
      p
    }
    // few tasks: inline CASE routing, no join anywhere in the pass
    val few = Seq(Sketches.SelTask("a", 0.0, 20000.0))
    val hist = Sketches.selHistogramFrame(df, "k", "v", few, buckets = 16)
    assert(pin(hist, "histogram/inline", expectJoin = false)
      .contains("partial_count"), "histogram pass lost partial aggregation")
    pin(Sketches.selCollectFrame(df, "k", "v", few), "collect/inline",
      expectJoin = false)
    // many tasks: broadcast-join routing (constant expression depth)
    val many = (0 until 100).map(i =>
      Sketches.SelTask(s"g$i", 0.0, 20000.0))
    pin(Sketches.selHistogramFrame(df, "k", "v", many, buckets = 16),
      "histogram/join", expectJoin = true)
    pin(Sketches.selCollectFrame(df, "k", "v", many), "collect/join",
      expectJoin = true)
  }

  /** High group cardinality: 2,000 groups × ~30 rows resolve in the same
    * bounded passes — the regime where a CASE-chain formulation would
    * have blown past codegen's expression budget.
    */
  test("handles thousands of groups (task routing does not grow expression depth)") {
    val rows = (0 until 60000).map(i => (s"g${i % 2000}", synth(1, i).head))
    check(rows, buckets = 8, collectAt = 4, parts = 8)
  }

  /** Deterministic generator sweep (BboxOpsSpec's fixed-seed style):
    * mixed sign, mixed magnitude (1e-3 to 1e12), heavy-duplicate atoms,
    * uneven group sizes — the distributions the fixed fixtures above do
    * not reach (they are all-positive and single-magnitude). Exact
    * equality with the driver-side reference is required: the selection
    * returns true order statistics, so no tolerance is owed.
    */
  test("property: matches the reference on adversarial distributions (fixed seed)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val valueGen = Gen.oneOf(
      Gen.choose(-1e6, 1e6),
      Gen.choose(-1.0e-3, 1.0e-3),
      Gen.oneOf(-5.5, 0.0, 13.25), // duplicate atoms across groups
      Gen.choose(-1e12, 1e12))
    val rowGen = for {
      g <- Gen.frequency(4 -> Gen.const(0), 2 -> Gen.choose(1, 3),
        1 -> Gen.choose(4, 6)) // skewed group sizes
      v <- valueGen
    } yield (s"g$g", v)
    val rows = Gen.listOfN(5000, rowGen)
      .pureApply(Gen.Parameters.default, Seed(12L))
    check(rows, buckets = 8, collectAt = 16) // forced multi-pass
    check(rows, buckets = 512, collectAt = 64)
  }

  /** The selection reads a 16-column lineitem but each pass must scan
    * only the group key and the value — column pruning reaching the
    * parquet scan is most of the I/O story for a multi-pass plan.
    */
  test("plan: selection scans prune to the two live columns") {
    val li = graft.core.Tables(spark, testData("0.001")).lineitem
    val p = Sketches.selHistogramFrame(li, "l_returnflag",
      "l_extendedprice", Seq(Sketches.SelTask("A", 0.0, 1e9)), buckets = 16)
      .queryExecution.executedPlan.toString
    val read = p.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(fail(s"no parquet scan in plan\n$p"))
    assert(read.contains("l_returnflag") && read.contains("l_extendedprice"))
    assert(!read.contains("l_orderkey") && !read.contains("l_comment"),
      s"scan reads pruned columns: $read")
  }

  test("z3 equals Spark's own percentile_cont on the fixture") {
    val got = Sketches.priceQuantiles(spark, testData("0.001")).collect()
    graft.core.Tables(spark, testData("0.001")).lineitem
      .createOrReplaceTempView("qsel_li")
    val want = spark.sql(
      """SELECT l_returnflag,
        |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p50,
        |  round(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p90,
        |  round(percentile_cont(0.99) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p99
        |FROM qsel_li GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .collect()
    assert(got.map(_.toSeq).toSeq === want.map(_.toSeq).toSeq)
  }
}
