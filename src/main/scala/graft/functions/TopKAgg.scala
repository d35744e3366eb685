package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k state: a size-k min-heap over (score DESC, id ASC) rank
  * order — the heap root is the WEAKEST kept element, so insertion is
  * O(log k) and the state never exceeds k pairs regardless of group size.
  * Rank order is total and deterministic: higher score wins, ties break to
  * the smaller id (the library-wide tie rule — ranking never hinges on
  * sub-ulp float noise because equal scores order by id).
  */
final class TopKHeap(val k: Int) {
  // (score, id) pairs; heap-ordered by "weaker-first": lower score first,
  // ties higher id first (so the weakest-ranked element is at the root)
  private[functions] val scores = new Array[Double](k)
  private[functions] val ids = new Array[Long](k)
  private[functions] var size = 0

  // TOTAL order via java.lang.Double.compare (Spark's own double ordering):
  // NaN ranks greatest and -0.0 below 0.0. Primitive < / == are not total
  // under NaN — a NaN at the root compared false against everything, so it
  // could never be displaced and silently blocked strictly better scores;
  // and primitive == calls ±0.0 a tie while the final sort's total order
  // does not, making rank order disagree with the heap's own displacement.
  @inline private def weaker(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c < 0 || (c == 0 && i1 > i2)
  }

  private def siftUp(pos0: Int): Unit = {
    var pos = pos0
    while (pos > 0 && weaker(scores(pos), ids(pos), scores((pos - 1) / 2), ids((pos - 1) / 2))) {
      val p = (pos - 1) / 2
      swap(pos, p); pos = p
    }
  }

  private def siftDown(pos0: Int): Unit = {
    var pos = pos0
    var continue = true
    while (continue) {
      val l = 2 * pos + 1
      val r = l + 1
      var m = pos
      if (l < size && weaker(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && weaker(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == pos) continue = false else { swap(pos, m); pos = m }
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val s = scores(a); scores(a) = scores(b); scores(b) = s
    val i = ids(a); ids(a) = ids(b); ids(b) = i
  }

  def insert(score: Double, id: Long): Unit =
    if (size < k) {
      scores(size) = score; ids(size) = id; size += 1
      siftUp(size - 1)
    } else if (weaker(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      siftDown(0)
    }

  /** (score, id) pairs in final rank order: score DESC, id ASC — the same
    * Double.compare total order the heap uses (negating under sortBy would
    * reintroduce the ±0.0 disagreement the comparator exists to avoid).
    */
  def sorted: Array[(Double, Long)] = {
    val out = (0 until size).map(i => (scores(i), ids(i))).toArray
    out.sortWith { case ((s1, i1), (s2, i2)) =>
      val c = java.lang.Double.compare(s1, s2)
      c > 0 || (c == 0 && i1 < i2)
    }
  }
}

/** `graft_topk(k, score, id)` — exact per-group top-k as a NATIVE AGGREGATE
  * (TypedImperativeAggregate), the §2.11 taxonomy's aggregate tier next to
  * the scalar expressions (graft_dot/graft_hash60/graft_minhash_bands),
  * the optimizer rule (RewriteIntervalJoin) and the physical operator
  * (AsOfJoinExec). Returns array<struct<score, id>> in rank order (score
  * DESC, id ASC tie-break).
  *
  * Why an aggregate and not a window: row_number-over-partition must SORT
  * each group (two Sort operators around the exchange even with Catalyst's
  * WindowGroupLimit pruning), while an aggregate top-k is heap insertion —
  * no sort anywhere, and the partial heaps combine MAP-SIDE, so the
  * exchange carries at most k pairs per (group, input partition) no matter
  * how hot a group is: the skew contract of a hash aggregate, not a window
  * buffer. The w5 gate pins result parity against the window spelling in
  * DuckDB; SCALING.md carries the measured head-to-head.
  *
  * Null scores/ids never enter the heap (SQL aggregate convention:
  * aggregates ignore nulls).
  */
@ExpressionDescription(
  usage = "graft_topk(k, score, id) - top-k (score, id) pairs per group, score DESC, id ASC")
case class TopKAgg(
    k: Int,
    score: Expression,
    id: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  require(k > 0, s"graft_topk requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))), containsNull = false)

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Number].doubleValue(),
        i.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.size) {
      buf.insert(other.scores(i), other.ids(i)); i += 1
    }
    buf
  }

  override def eval(buf: TopKHeap): Any =
    new GenericArrayData(buf.sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.toSeq)

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) {
      out.writeDouble(buf.scores(i)); out.writeLong(buf.ids(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKHeap(k)
    var i = 0
    while (i < n) { buf.insert(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "graft_topk"
}

object TopKAgg {
  /** SQL-surface constructor: `graft_topk(k, score, id)` with a foldable
    * integral k — malformed calls fail at analysis, not execution.
    */
  def fromSql(exprs: Seq[Expression]): TopKAgg = {
    require(exprs.length == 3,
      s"graft_topk(k, score, id) takes 3 arguments, got ${exprs.length}")
    val kExpr = exprs.head
    require(kExpr.foldable, "graft_topk: k must be a literal")
    val kv = kExpr.eval()
    // a null or non-numeric literal k must fail with the analysis-time
    // message this constructor promises, not a bare NPE/ClassCastException
    require(kv != null && kv.isInstanceOf[Number],
      "graft_topk: k must be a non-null numeric literal, got " +
        (if (kv == null) "NULL" else kv.getClass.getSimpleName))
    val k = kv.asInstanceOf[Number].intValue()
    TopKAgg(k, exprs(1), exprs(2))
  }
}
