package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite a naive bounded-interval join into the
  * time-bucket equi-join `graft.operators.TemporalJoins.boundedRange`
  * builds by hand.
  *
  * An inner join whose only cross-side predicate is
  * `abs(l.ts - r.ts) <= w` has no equi-join key, so Spark can only plan
  * it as BroadcastNestedLoopJoin / CartesianProduct — the O(n·m) trap
  * SCALING.md measures at 1,105 s for DuckDB's IEJoin vs 5.3 s for the
  * bucket shape at 10M events. Users writing the naive predicate in
  * plain SQL (`spark.sql("... JOIN ... ON abs(a.ts - b.ts) <= 3600")`)
  * get the safe plan automatically with this rule installed
  * ([[graft.GraftExtensions]]): the left side fans out to its 3 covering
  * buckets of width `w` (a Generate of a 3-element array — |Δ| ≤ w spans
  * at most 2 adjacent buckets, 3 covers both truncation directions), the
  * right side projects its single bucket, and the join gains an
  * `EqualTo` on the bucket columns — which `ExtractEquiJoinKeys` then
  * plans as a hash join. The ORIGINAL condition is kept verbatim next to
  * the new equality, so results are bit-identical; a final Project drops
  * the bucket columns.
  *
  * Deliberately narrow (each guard is a correctness or don't-pessimize
  * condition):
  *  - inner joins only (outer-join null-extension rows would need the
  *    fan-out deduplicated);
  *  - fires only when NO cross-side equality conjunct exists — if one
  *    does, Spark already has an equi-join key and the fan-out would
  *    only add rows;
  *  - both interval operands integral (int/long — event-time columns in
  *    this engine flow as epoch micros; `unix_micros` a timestamp first),
  *    references cleanly split across the two sides, width a positive
  *    foldable literal;
  *  - the rewritten join contains a cross-side equality, so the rule
  *    cannot re-fire on its own output (fixed-point safe).
  */
object RewriteIntervalJoin extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasEqui = conjuncts.exists {
        case EqualTo(a, b) => crossSides(a, b, l, r)
        case EqualNullSafe(a, b) => crossSides(a, b, l, r)
        case _ => false
      }
      if (hasEqui) j
      else conjuncts.iterator.flatMap(matchInterval(_, l, r)).nextOption() match {
        case Some((xl, xr, w)) => rewrite(j, l, r, cond, hint, xl, xr, w)
        case None => j
      }
  }

  private def crossSides(a: Expression, b: Expression,
      l: LogicalPlan, r: LogicalPlan): Boolean =
    (a.references.nonEmpty && b.references.nonEmpty) &&
      ((a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)) ||
        (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet)))

  /** `abs(x - y) <= w` (either comparison orientation) with x from one
    * side, y from the other, both integral and deterministic, w a
    * positive integral literal → (left-side expr, right-side expr, w).
    */
  private def matchInterval(e: Expression, l: LogicalPlan,
      r: LogicalPlan): Option[(Expression, Expression, Long)] = {
    val absLeq = e match {
      case LessThanOrEqual(a: Abs, Literal(w, IntegerType)) =>
        Some((a, w.asInstanceOf[Int].toLong))
      case LessThanOrEqual(a: Abs, Literal(w, LongType)) =>
        Some((a, w.asInstanceOf[Long]))
      case GreaterThanOrEqual(Literal(w, IntegerType), a: Abs) =>
        Some((a, w.asInstanceOf[Int].toLong))
      case GreaterThanOrEqual(Literal(w, LongType), a: Abs) =>
        Some((a, w.asInstanceOf[Long]))
      case _ => None
    }
    absLeq.collect {
      case (Abs(Subtract(a, b, _), _), w)
        if w > 0 && integral(a) && integral(b) &&
          a.deterministic && b.deterministic =>
        if (a.references.nonEmpty && b.references.nonEmpty &&
          a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet))
          Some((a, b, w))
        else if (a.references.nonEmpty && b.references.nonEmpty &&
          a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet))
          Some((b, a, w))
        else None
    }.flatten
  }

  private def integral(e: Expression): Boolean =
    e.dataType == IntegerType || e.dataType == LongType

  private def rewrite(j: Join, l: LogicalPlan, r: LogicalPlan,
      cond: Expression, hint: JoinHint,
      xl: Expression, xr: Expression, w: Long): LogicalPlan = {
    val width = Literal(w, LongType)
    def bucket(e: Expression): Expression =
      IntegralDivide(Cast(e, LongType), width)
    // left: 3 covering buckets (b-1, b, b+1). Truncating DIV makes the
    // cell at zero double-width, which only ever SHRINKS bucket distance,
    // so |Δ| ≤ w still implies adjacent-or-equal buckets.
    val bl = bucket(xl)
    val one = Literal(1L, LongType)
    val genOut = AttributeReference("__graft_bucket", LongType)()
    val gen = Generate(
      Explode(CreateArray(Seq(Subtract(bl, one), bl, Add(bl, one)))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(genOut), child = l)
    val brAlias = Alias(bucket(xr), "__graft_bucket_r")()
    val proj = Project(r.output :+ brAlias, r)
    val newJoin = Join(gen, proj, Inner,
      Some(And(EqualTo(genOut, brAlias.toAttribute), cond)), hint)
    Project(j.output, newJoin)
  }
}
