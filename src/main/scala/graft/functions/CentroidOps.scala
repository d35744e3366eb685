package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Nearest-centroid top-`take` cells for one vector, against a FIXED
  * centroid set carried as plain expression data (not child literals).
  *
  * Why not `greatest(struct(round(graft_dot(v, lit(cv)), …), …) * K)`:
  * that shape inlines K·Dim literal doubles into the expression tree, so
  * the generated Java grows as O(K·Dim) — at the √n quantizer schedule
  * (K=25 at x10, K=80 at x100) whole-stage codegen blows past JIT/method
  * limits and Janino compile time + interpreted fallback dominated the
  * n4 scale run (206 s at x10 for ~32M multiply-adds). Here the
  * generated code is ONE virtual call per row regardless of K; the
  * K·Dim loop runs in this JIT-compiled method over a flat primitive
  * array. Scores and ordering are bit-identical to the unrolled form:
  * score = round4(seqDot(v, c) / (norm·cnorm)) with Spark's
  * Round-on-double semantics (BigDecimal.valueOf → HALF_UP — exactly
  * what `round(col, 4)` does on DoubleType), ordered score DESC, cid ASC
  * (strict-greater insertion over ascending-cid centroids keeps the
  * lowest cid on ties).
  *
  * Null handling: null vector/norm → null (nullSafe); take ≥ K returns
  * all K cells ordered.
  */
case class TopCells(
    left: Expression,
    right: Expression,
    cids: Array[Long],
    flatCvs: Array[Double],
    cnorms: Array[Double],
    dim: Int,
    take: Int)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val vOk = left.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (vOk && right.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, double), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_top_cells"

  /** Per-row kernel, shared by interpreted eval and codegen. */
  def topCells(vec: ArrayData, norm: Double): ArrayData = {
    val k = cids.length
    val n = math.min(take, k)
    // top-n by (score DESC, cid ASC): insertion over ascending-cid
    // centroids with strict-greater displacement
    val topScore = new Array[Double](n)
    val topCid = new Array[Long](n)
    var filled = 0
    var c = 0
    while (c < k) {
      var dot = 0.0
      val base = c * dim
      var i = 0
      while (i < dim) {
        dot += vec.getDouble(i) * flatCvs(base + i)
        i += 1
      }
      // Round-parity: Spark's round(double, 4) passes NaN/±Infinity through
      // unchanged, while BigDecimal.valueOf(NaN) THROWS — a zero-norm or
      // NaN-element vector must degrade exactly like the unrolled
      // round(graft_dot/..., 4) form, not kill the query (callers exclude
      // such vectors upstream; this is the not-crash contract)
      val raw = dot / (norm * cnorms(c))
      val score =
        if (java.lang.Double.isFinite(raw))
          JBigDecimal.valueOf(raw).setScale(4, RoundingMode.HALF_UP).doubleValue()
        else raw
      // Double.compare, not primitive <: NaN must rank GREATEST (Spark's
      // desc-sort order, which the unrolled form inherits) instead of
      // comparing false against everything and never displacing
      var pos = filled
      while (pos > 0 && java.lang.Double.compare(topScore(pos - 1), score) < 0) pos -= 1
      if (pos < n) {
        val last = math.min(filled, n - 1)
        var j = last
        while (j > pos) {
          topScore(j) = topScore(j - 1); topCid(j) = topCid(j - 1); j -= 1
        }
        topScore(pos) = score
        topCid(pos) = cids(c)
        if (filled < n) filled += 1
      }
      c += 1
    }
    val out = new Array[Any](filled)
    var o = 0
    while (o < filled) { out(o) = topCid(o); o += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    topCells(a.asInstanceOf[ArrayData], b.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("topCellsExpr", this, classOf[TopCells].getName)
    nullSafeCodeGen(ctx, ev, (v, n) =>
      s"${ev.value} = $ref.topCells($v, $n);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopCells =
    copy(left = newLeft, right = newRight)
}

object TopCells {

  /** Column builder: top-`take` cell ids for (v, norm) against `cents`
    * given as (cid, vector, norm) triples, ordered rounded-cosine DESC,
    * cid ASC.
    */
  def cellsCol(cents: Seq[(Long, Array[Double], Double)], take: Int,
      v: Column, norm: Column): Column = {
    require(cents.nonEmpty, "empty centroid set")
    val dim = cents.head._2.length
    val expr = TopCells(
      org.apache.spark.sql.graft.ColumnShim.expression(v),
      org.apache.spark.sql.graft.ColumnShim.expression(norm),
      cents.map(_._1).toArray,
      cents.flatMap(_._2).toArray,
      cents.map(_._3).toArray,
      dim, take)
    org.apache.spark.sql.graft.ColumnShim.column(expr)
  }
}
