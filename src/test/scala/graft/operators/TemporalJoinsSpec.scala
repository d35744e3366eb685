package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Property tests for the generic temporal-join operators against
  * brute-force reference implementations on seeded random data — dense
  * timestamp collisions included, because the tie rules (probe-vs-build at
  * equal instants, build-vs-build tieBreak) are exactly where a window
  * formulation can silently diverge from as-of semantics. j1/j2 pin the
  * operators against DuckDB on the fixture; this pins the full parameter
  * space (strict/inclusive, keepUnmatched, multi-key, keyless range).
  */
class TemporalJoinsSpec extends SparkTestBase {

  private val rnd = new Random(20260813)

  // (key, ts, id) with heavy ts collisions: ts drawn from only 40 values
  private def rows(n: Int, keys: Int): Seq[(Long, Long, Long)] =
    (1 to n).map(i =>
      (rnd.nextInt(keys).toLong, rnd.nextInt(40).toLong * 10, i.toLong))

  test("asOf equals brute force across strict/inclusive/keepUnmatched under ts collisions") {
    import spark.implicits._
    val probeRows = rows(300, 8)
    val buildRows = rows(300, 8)
    val probe = probeRows.toDF("k", "ts", "pid").repartition(7)
    val build = buildRows.toDF("k", "ts", "bid").repartition(5)

    for (strict <- Seq(true, false); keep <- Seq(true, false)) {
      val got = TemporalJoins.asOf(probe, build,
          keys = Seq("k"), tsCol = "ts", carry = Seq("bid", "ts"),
          strict = strict, tieBreak = Seq("bid"), keepUnmatched = keep)
        .select("pid", "asof_bid", "asof_ts")
        .collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .toSet

      val want = probeRows.flatMap { case (k, t, pid) =>
        val cands = buildRows.filter { case (bk, bt, _) =>
          bk == k && (if (strict) bt < t else bt <= t)
        }
        if (cands.isEmpty) {
          if (keep) Some((pid, None, None)) else None
        } else {
          // latest instant wins; equal instants resolve to max tieBreak
          val (_, bt, bid) = cands.maxBy { case (_, bt, bid) => (bt, bid) }
          Some((pid, Some(bid), Some(bt)))
        }
      }.toSet
      assert(got === want, s"strict=$strict keepUnmatched=$keep")
    }
  }

  test("asOf probe rows never attribute to each other (self-exclusion at equal instants)") {
    import spark.implicits._
    // every row same key, same instant: strict => nothing matches
    val probe = Seq((1L, 50L, 1L), (1L, 50L, 2L)).toDF("k", "ts", "pid")
    val build = Seq((1L, 50L, 9L)).toDF("k", "ts", "bid")
    val strictRows = TemporalJoins.asOf(probe, build,
      Seq("k"), "ts", Seq("bid"), strict = true).collect()
    assert(strictRows.isEmpty, "strict as-of must ignore same-instant builds")
    val incl = TemporalJoins.asOf(probe, build,
      Seq("k"), "ts", Seq("bid"), strict = false).collect()
    assert(incl.length === 2 && incl.forall(_.getAs[Long]("asof_bid") == 9L))
  }

  test("asOf never matches null-ts rows, on either side (shared contract with asOfExec)") {
    import spark.implicits._
    // null build ts sorts NULLS FIRST into every probe frame and would win
    // `last`; null probe ts must come out unmatched, not crash or match
    val probe = Seq((1L, Some(100L), 1L), (1L, None, 2L))
      .toDF("k", "ts", "pid")
    val build = Seq((1L, None, 77L), (1L, Some(50L), 88L))
      .toDF("k", "ts", "bid")
    val got = TemporalJoins.asOf(probe, build, Seq("k"), "ts", Seq("bid"),
      keepUnmatched = true).collect()
      .map(r => r.getAs[Long]("pid") -> Option(r.getAs[Any]("asof_bid"))).toMap
    assert(got(1L) === Some(88L), "probe must match the real (non-null-ts) build row")
    assert(got(2L) === None, "a null-ts probe row must come out unmatched")
    // and the exec form agrees on the same inputs
    val exec = TemporalJoins.asOfExec(probe, build, Seq("k"), "ts", Seq("bid"),
      keepUnmatched = true).collect()
      .map(r => r.getAs[Long]("pid") -> Option(r.getAs[Any]("asof_bid"))).toMap
    assert(exec === got, "window and exec forms diverged on null ts")
  }

  test("boundedRangeAnti rejects null left ids loudly instead of conflating them") {
    import spark.implicits._
    // the anti stage removes rows BY ID: all null-id rows share one
    // identity, so they drop or survive together — there is no per-row
    // correct answer, and the contract fails fast rather than silently
    // dropping genuinely-unmatched rows
    val left = Seq((Some(1L), 100L), (None, 100L), (Some(3L), 900L))
      .toDF("lid", "lts")
    val right = Seq(Tuple1(105L)).toDF("rts")
    val err = intercept[IllegalArgumentException] {
      TemporalJoins.boundedRangeAnti(left, right, "lid", "lts", "rts",
        window = 10L)
    }
    assert(err.getMessage.contains("null"), s"unexpected message: $err")
    // and a null-FREE id column passes the gate with per-row semantics
    val clean = Seq((1L, 100L), (3L, 900L)).toDF("lid", "lts")
    val got = TemporalJoins.boundedRangeAnti(clean, right, "lid", "lts", "rts",
      window = 10L).collect().map(_.getAs[Long]("lid")).toSet
    assert(got === Set(3L),
      "only the genuinely unmatched row may survive the anti-join")
  }

  test("boundedRange equals brute force, keyed and keyless, pairs found exactly once") {
    import spark.implicits._
    val leftRows = rows(200, 4)
    val rightRows = rows(200, 4)
    val left = leftRows.toDF("k", "lts", "lid").repartition(6)
    val right = rightRows.toDF("k", "rts", "rid").repartition(3)
    val w = 35L

    for (keyed <- Seq(true, false)) {
      val got = TemporalJoins.boundedRange(left, right, "lts", "rts", w,
          keys = if (keyed) Seq("k") else Nil)
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      // exactly once: no covering-bucket double counting
      assert(got.length === got.toSet.size, "a pair was emitted twice")
      val want = (for {
        (lk, lt, lid) <- leftRows
        (rk, rt, rid) <- rightRows
        if (!keyed || lk == rk) && math.abs(lt - rt) <= w
      } yield (lid, rid)).toSet
      assert(got.toSet === want, s"keyed=$keyed")
    }
  }

  test("the 2W covering-bucket lemma holds on the non-negative domain (boundary-dense)") {
    // pure arithmetic twin of boundedRange's bucket construction: for any
    // lts, rts >= 0 with |lts - rts| <= W, rts's bucket must be one of the
    // two covering buckets. Sweep W over awkward widths and ts over every
    // boundary-adjacent offset, plus random draws — the exact-boundary and
    // lts < W cases are where a cover scheme breaks first.
    for (w <- Seq(1L, 2L, 3L, 7L, 35L, 1000L)) {
      val b = 2 * w
      def cover(lts: Long): Set[Long] =
        Set(math.max(lts - w, 0L) / b, (lts + w) / b)
      val boundaryTs = (0L to 4L).flatMap(k =>
        Seq(k * b - 1, k * b, k * b + 1, k * b + w - 1, k * b + w, k * b + w + 1))
        .filter(_ >= 0)
      val randomTs = Seq.fill(200)(math.abs(rnd.nextLong()) % (b * 50))
      for (lts <- boundaryTs ++ randomTs; d <- -w to w by math.max(1, w / 7);
           rts = lts + d if rts >= 0) {
        assert(cover(lts).contains(rts / b),
          s"W=$w lts=$lts rts=$rts: bucket ${rts / b} not in ${cover(lts)}")
      }
    }
  }

  test("boundedRangeAnti is the exact complement of boundedRange's matched left set") {
    import spark.implicits._
    val leftRows = rows(200, 4)
    val rightRows = rows(200, 4)
    val left = leftRows.toDF("k", "lts", "lid").repartition(6)
    val right = rightRows.toDF("k", "rts", "rid").repartition(3)
    val w = 35L

    for (keyed <- Seq(true, false)) {
      val anti = TemporalJoins.boundedRangeAnti(left, right, "lid",
          "lts", "rts", w, keys = if (keyed) Seq("k") else Nil)
        .select("lid").collect().map(_.getLong(0)).toSet
      val matched = (for {
        (lk, lt, lid) <- leftRows
        (rk, rt, _) <- rightRows
        if (!keyed || lk == rk) && math.abs(lt - rt) <= w
      } yield lid).toSet
      assert(anti === leftRows.map(_._3).toSet -- matched, s"keyed=$keyed")
      // complement: disjoint and jointly exhaustive, exactly one row each
      assert((anti & matched).isEmpty)
      // boundary: a right row at EXACTLY window distance still matches
      // (<= semantics), so such a left row must NOT appear in the anti set
      val exact = Seq((0L, 1000L, 900L)).toDF("k", "lts", "lid")
      val probe = Seq((0L, 1000L + w)).toDF("k", "rts")
      assert(TemporalJoins.boundedRangeAnti(exact, probe, "lid",
        "lts", "rts", w).count() === 0L)
      assert(TemporalJoins.boundedRangeAnti(exact,
        Seq((0L, 1000L + w + 1)).toDF("k", "rts"), "lid",
        "lts", "rts", w).count() === 1L)
    }
  }

  test("asOf plans one exchange chain and no join operator") {
    import spark.implicits._
    val probe = rows(50, 3).toDF("k", "ts", "pid")
    val build = rows(50, 3).toDF("k", "ts", "bid")
    val plan = TemporalJoins.asOf(probe, build, Seq("k"), "ts", Seq("bid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "as-of must not plan any join")
    assert(plan.contains("Window"), "as-of must be the window formulation")
  }
}
