package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType, TimestampType}

/** The full custom-operator stack for the AS-OF join (SURVEY §2.6 extension
  * tier): a logical join marker, a planner strategy, and a dedicated
  * physical operator — the (c) route of the Spark-first preference order,
  * used where composing built-ins costs real work at scale.
  *
  * [[graft.operators.TemporalJoins.asOf]] already expresses the as-of join
  * with built-ins (union + running window): one shuffle, correct and
  * scale-safe. But the window formulation pays for generality — both sides
  * widen to a common schema carrying each other's null payload struct, the
  * window operator materializes per-row frame state, and the probe side is
  * re-filtered out of the union afterwards. A dedicated merge exec does the
  * same work as one linear pass per partition with O(1) per-key state and
  * NO union: sort probe by (keys, ts), build by (keys, ts, tieBreak), then
  * walk both sorted streams once, carrying the last qualifying build row.
  *
  * Same distribution contract as a shuffled join — both children hash-
  * cluster on the keys (`ClusteredDistribution`, co-partitioned by
  * `EnsureRequirements` exactly as for a sort-merge join) and sort inside
  * partitions — so on a cluster this is one exchange per side, then a
  * streaming merge with no per-row lookups and no buffered groups: state is
  * ONE carried build row regardless of key cardinality or skew (a skewed
  * key costs scan time, never memory).
  *
  * Semantics (pinned by the shared j1/j3 DuckDB ASOF oracle):
  *  - for each probe row, the latest build row with equal keys and build
  *    ts strictly earlier (`strict`, ASOF default) or earlier-or-equal;
  *  - build-side ties on ts resolve to the largest `tieBreak` tuple
  *    ("latest event wins", same as the window formulation and the
  *    streaming twin);
  *  - rows with a null ts never match and never attribute; null keys
  *    match null keys (the two sides meet through a null-safe sorted
  *    merge, like a sort-merge join on `<=>`) — callers wanting SQL
  *    equality drop null-keyed rows first;
  *  - Inner drops unmatched probe rows; LeftOuter null-extends them.
  */
object AsOfJoin {

  /** Boolean join-condition marker carrying the as-of spec. Unevaluable on
    * purpose: it never survives to execution — [[AsOfJoinStrategy]] consumes
    * it during planning. Only meaningful inside an inner/left join condition
    * with probe on the left; anywhere else planning fails fast.
    */
  case class AsOfCondition(
      probeTs: Expression,
      buildTs: Expression,
      tieBreak: Seq[Expression],
      strict: Boolean)
    extends Expression with Unevaluable {
    override def children: Seq[Expression] = probeTs +: buildTs +: tieBreak
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = false
    override def prettyName: String = "graft_asof"
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(probeTs = newChildren(0), buildTs = newChildren(1),
        tieBreak = newChildren.drop(2).toSeq)
  }

  /** SQL surface (`graft_asof(p_ts, b_ts, tieBreak...)`, strict ASOF): lets
    * plain-SQL joins opt into the exec the same way the DataFrame API does.
    */
  def fromSql(exprs: Seq[Expression]): Expression = {
    require(exprs.length >= 2,
      s"graft_asof(probe_ts, build_ts, tieBreak...) takes at least 2 " +
        s"arguments, got ${exprs.length}")
    AsOfCondition(exprs(0), exprs(1), exprs.drop(2), strict = true)
  }

  private[plans] def orderable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | TimestampType => true
    case _ => false
  }
}

/** Plans a `Join(probe, build, Inner|LeftOuter, keysEq && AsOfCondition)`
  * into [[AsOfJoinExec]]. Runs before Spark's JoinSelection (injected
  * strategies precede the built-ins), so a marked join never reaches the
  * hash-join planner, which could not evaluate the marker. A marker in any
  * other position is a planning-time error, not a runtime surprise.
  */
object AsOfJoinStrategy extends SparkStrategy with PredicateHelper {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(l, r, joinType, Some(cond), _)
        if cond.exists(_.isInstanceOf[AsOfJoin.AsOfCondition]) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val (markers, rest) = conjuncts.partition(_.isInstanceOf[AsOfJoin.AsOfCondition])
      def fail(why: String): Nothing = throw new IllegalArgumentException(
        s"graft_asof join cannot be planned: $why (condition: $cond)")
      // size check BEFORE head: a marker nested under OR/NOT is found by
      // cond.exists but yields zero top-level conjuncts, and markers.head
      // would throw a bare NoSuchElementException instead of this error
      if (markers.size != 1)
        fail("exactly one TOP-LEVEL (AND-conjunct) graft_asof marker is required")
      val m = markers.head.asInstanceOf[AsOfJoin.AsOfCondition]
      if (joinType != Inner && joinType != LeftOuter)
        fail(s"only INNER and LEFT OUTER are supported, got $joinType")
      if (!m.probeTs.references.subsetOf(l.outputSet) ||
          !m.buildTs.references.subsetOf(r.outputSet) ||
          !m.tieBreak.forall(_.references.subsetOf(r.outputSet)))
        fail("probe ts must come from the left side, build ts and tieBreak from the right")
      if (!AsOfJoin.orderable(m.probeTs.dataType) ||
          !AsOfJoin.orderable(m.buildTs.dataType))
        fail("ts operands must be timestamp/long/int")
      if (m.probeTs.dataType != m.buildTs.dataType)
        fail("probe and build ts must have the same type " +
          "(a timestamp vs epoch-long mix would compare different units)")
      val keys = rest.map {
        case EqualTo(a, b)
            if a.references.nonEmpty && b.references.nonEmpty &&
              a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet) =>
          (a, b)
        case EqualTo(a, b)
            if a.references.nonEmpty && b.references.nonEmpty &&
              a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet) =>
          (b, a)
        case other =>
          fail(s"every other conjunct must be a cross-side equality, got $other")
      }
      if (keys.isEmpty)
        fail("at least one cross-side key equality is required " +
          "(a keyless as-of would serialize to one partition)")
      if (keys.map(_._1.dataType) != keys.map(_._2.dataType))
        fail("key equality sides must have identical types")
      AsOfJoinExec(keys.map(_._1), keys.map(_._2), m.probeTs, m.buildTs,
        m.tieBreak, m.strict, joinType == LeftOuter,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sorted-merge as-of join. Children arrive hash-clustered on the keys and
  * sorted by (keys, ts[, tieBreak]); one forward pass per partition carries
  * the latest qualifying build row per key — O(1) state, no buffering, no
  * nested loops. Interpreted (no codegen): the per-row work is two field
  * comparisons and the merge never re-visits a row, so the pass is scan-
  * bound; see PLANS.md for the measured comparison against the window
  * formulation this replaces.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    tieBreak: Seq[Expression],
    strict: Boolean,
    keepUnmatched: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    if (keepUnmatched) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      (SortOrder(rightTs, Ascending) +: tieBreak.map(SortOrder(_, Ascending))))

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    left.execute().zipPartitions(right.execute()) { (probeIter, buildIter) =>
      // One codegen'd projection per side packs (keys..., ts) into a flat
      // UnsafeRow: key comparison and ts access both read that row, so the
      // per-probe work is one projection + primitive field reads — no boxed
      // eval in the merge loop.
      val n = leftKeys.length
      val pProj = UnsafeProjection.create(leftKeys :+ leftTs, left.output)
      val bProj = UnsafeProjection.create(rightKeys :+ rightTs, right.output)
      val keyAttrs = leftKeys.zipWithIndex.map { case (k, i) =>
        AttributeReference(s"k$i", k.dataType, nullable = true)()
      }
      // codegen'd comparator over the first n fields (the trailing ts field
      // is outside the bound ordinals and ignored)
      val keyOrd = RowOrdering.create(
        keyAttrs.map(SortOrder(_, Ascending)), keyAttrs)
      val tsIsInt = leftTs.dataType == IntegerType
      @inline def tsOf(r: InternalRow): Long =
        if (tsIsInt) r.getInt(n).toLong else r.getLong(n)
      // bind against `output` (right side nullability-adjusted under
      // keepUnmatched) — binding against the children's non-nullable attrs
      // would elide the null checks the null-extended row needs
      val toUnsafe = UnsafeProjection.create(output, output)

      new Iterator[InternalRow] {
        private[this] val joined = new JoinedRow
        private[this] val nullRight = new GenericInternalRow(right.output.length)
        // Lookahead build row + the carried last qualifying row for the
        // current key run (copied: iterator rows reuse buffers). O(1) state.
        private[this] var bNext: InternalRow = _
        private[this] var bNextP: InternalRow = _
        private[this] var carried: InternalRow = _
        private[this] var carriedP: InternalRow = _
        private[this] var pending: InternalRow = _
        pull()

        private def pull(): Unit =
          if (buildIter.hasNext) {
            bNext = buildIter.next().copy()
            bNextP = bProj(bNext).copy()
          } else { bNext = null; bNextP = null }

        override def hasNext: Boolean = {
          if (pending == null) computeNext()
          pending != null
        }

        override def next(): InternalRow = {
          if (pending == null) computeNext()
          val r = pending; pending = null; r
        }

        private def computeNext(): Unit = {
          while (pending == null && probeIter.hasNext) {
            val p = probeIter.next()
            val pp = pProj(p)
            if (pp.isNullAt(n)) {
              // a null probe ts can never have an earlier build row
              if (keepUnmatched) pending = toUnsafe(joined(p, nullRight))
            } else {
              val pts = tsOf(pp)
              var advance = true
              while (advance && bNext != null) {
                val c = keyOrd.compare(bNextP, pp)
                if (c < 0) pull() // earlier key run: nothing probes it again
                else if (c > 0) advance = false
                else if (bNextP.isNullAt(n)) pull() // null build ts never attributes
                else {
                  val bts = tsOf(bNextP)
                  if (if (strict) bts < pts else bts <= pts) {
                    carried = bNext; carriedP = bNextP; pull()
                  } else advance = false
                }
              }
              if (carried != null && keyOrd.compare(carriedP, pp) == 0)
                pending = toUnsafe(joined(p, carried))
              else if (keepUnmatched)
                pending = toUnsafe(joined(p, nullRight))
            }
          }
          if (pending != null) numOutputRows += 1
        }
      }
    }
  }

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))
}
