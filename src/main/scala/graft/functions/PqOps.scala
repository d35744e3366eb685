package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Nearest product-quantization codeword for one sub-vector, against the
  * FIXED per-subspace codebooks carried as plain expression data — the
  * [[TopCells]] discipline applied to PQ encode (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011): K·subDim
  * literal doubles per subspace inlined as `greatest(struct(...))` would
  * regrow the exact Janino blow-up TopCells exists to avoid, so the
  * codebooks ride on the expression object and the generated code stays
  * ONE virtual call per row at any (M, K).
  *
  * Metric: squared L2, evaluated as argmax over round4(2·dot(sv, cv) −
  * ‖cv‖²) — the ‖sv‖² term is constant per row and dropping it keeps the
  * float expression three ops short. The round-4 (BigDecimal HALF_UP,
  * Spark's Round-on-double semantics, half-away-from-zero like DuckDB's
  * round) makes cross-engine ties deterministic; ties break to the LOWEST
  * code, the same (score DESC, cid ASC) order the oracle's row_number
  * uses. Dots run left-to-right like graft_dot and DuckDB's
  * list_dot_product, so scores are bit-identical across engines.
  *
  * Null handling: null m / sub-vector → null (nullSafe). Non-finite
  * scores pass through un-rounded and rank via Double.compare (NaN
  * greatest), mirroring TopCells' not-crash contract — callers exclude
  * NaN vectors upstream.
  */
case class PqNearest(
    left: Expression,
    right: Expression,
    cids: Array[Long],
    flatCbs: Array[Double],
    csqs: Array[Double],
    numSub: Int,
    k: Int,
    subDim: Int)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val svOk = right.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (svOk && left.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, array<double>), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_pq_nearest"

  /** Per-row kernel, shared by interpreted eval and codegen. */
  def nearest(m: Long, sv: ArrayData): Long = {
    val mi = m.toInt
    require(mi >= 0 && mi < numSub, s"subspace $m outside [0, $numSub)")
    var best = -1
    var bestScore = 0.0
    var c = 0
    while (c < k) {
      var dot = 0.0
      val base = (mi * k + c) * subDim
      var i = 0
      while (i < subDim) {
        dot += sv.getDouble(i) * flatCbs(base + i)
        i += 1
      }
      val raw = 2.0 * dot - csqs(mi * k + c)
      val score =
        if (java.lang.Double.isFinite(raw))
          JBigDecimal.valueOf(raw).setScale(4, RoundingMode.HALF_UP).doubleValue()
        else raw
      if (best < 0 || java.lang.Double.compare(score, bestScore) > 0) {
        bestScore = score
        best = c
      }
      c += 1
    }
    cids(best)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    nearest(a.asInstanceOf[Long], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqNearestExpr", this, classOf[PqNearest].getName)
    nullSafeCodeGen(ctx, ev, (m, sv) =>
      s"${ev.value} = $ref.nearest($m, $sv);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqNearest =
    copy(left = newLeft, right = newRight)
}

object PqNearest {

  /** Column builder: nearest codeword id for sub-vector `sv` of subspace
    * `m`, against per-subspace codebooks given as (cid, [m] → sub-vector)
    * — every subspace carries the SAME ascending cid list (one codeword
    * per seed vector per subspace), so ties break to the lowest cid in
    * both the kernel's insertion order and the oracle's row_number.
    */
  def codeCol(cids: Array[Long], codebooks: Array[Array[Array[Double]]],
      m: Column, sv: Column): Column = {
    require(codebooks.nonEmpty && codebooks.head.nonEmpty, "empty codebook set")
    val numSub = codebooks.length
    val k = codebooks.head.length
    require(cids.length == k, s"${cids.length} cids for $k codewords")
    require(cids.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
      "cids must ascend (tie-break contract)")
    val subDim = codebooks.head.head.length
    val flat = codebooks.flatMap(_.flatMap(_.toSeq))
    val csqs = codebooks.flatMap(_.map { cv =>
      var s = 0.0
      var i = 0
      while (i < cv.length) { s += cv(i) * cv(i); i += 1 }
      s
    })
    val expr = PqNearest(
      org.apache.spark.sql.graft.ColumnShim.expression(m),
      org.apache.spark.sql.graft.ColumnShim.expression(sv),
      cids, flat, csqs, numSub, k, subDim)
    org.apache.spark.sql.graft.ColumnShim.column(expr)
  }
}
