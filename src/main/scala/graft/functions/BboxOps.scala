package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bounding-box geometry of the reference cropper as pure column math
  * (P11/F5; reference `cropper/pnp-cropperLambda.py:60-82`): boxes are
  * `[ymin, xmin, ymax, xmax]` ints normalized to 0–1000; pad by 10% of the
  * box's own width/height, clamp to [0, 1000], scale to pixel space.
  *
  * Expression order mirrors the reference exactly — `(coord / 1000) * size`,
  * pad before clamp — so double results are bit-identical across engines
  * (all IEEE-754 ops in the same order). DuckDB twins take SQL expression
  * strings for the bbox list / width / height.
  */
object BboxOps {

  /** `PADDING_PERCENT` (`pnp-cropperLambda.py:12`). */
  val PaddingPercent = 0.10

  /** F5: bbox present, exactly 4 elements, and every element NON-NULL
    * (`pnp-cropperLambda.py:61-63`). The element check matters because
    * greatest/least SKIP nulls: a box like [null, 100, null, 300] would
    * otherwise sail through padClamp with the null side fabricated to the
    * full page extent (greatest(0, null) = 0, least(1000, null) = 1000) —
    * a silent full-height crop where the reference's Python arithmetic on
    * None would at least error.
    */
  def isValid(b: Column): Column =
    b.isNotNull && size(b) === 4 &&
      el(b, 1).isNotNull && el(b, 2).isNotNull &&
      el(b, 3).isNotNull && el(b, 4).isNotNull

  def isValidSql(x: String): String =
    s"($x IS NOT NULL AND len($x) = 4 AND $x[1] IS NOT NULL AND " +
      s"$x[2] IS NOT NULL AND $x[3] IS NOT NULL AND $x[4] IS NOT NULL)"

  private def el(b: Column, i: Int): Column =
    try_element_at(b, lit(i)).cast("double")

  /** Pad-and-clamp in normalized 0–1000 space: a struct of
    * (xmin_pad, ymin_pad, xmax_pad, ymax_pad) doubles.
    */
  def padClamp(b: Column): Column = {
    val (ymin, xmin, ymax, xmax) = (el(b, 1), el(b, 2), el(b, 3), el(b, 4))
    val bw = xmax - xmin
    val bh = ymax - ymin
    struct(
      greatest(lit(0.0), xmin - bw * lit(PaddingPercent)).as("xmin_pad"),
      greatest(lit(0.0), ymin - bh * lit(PaddingPercent)).as("ymin_pad"),
      least(lit(1000.0), xmax + bw * lit(PaddingPercent)).as("xmax_pad"),
      least(lit(1000.0), ymax + bh * lit(PaddingPercent)).as("ymax_pad"))
  }

  /** Normalized→pixel conversion against a page width/height: a struct of
    * (left, top, right, bottom) doubles, PIL crop order.
    */
  def toPixels(padded: Column, width: Column, height: Column): Column =
    struct(
      (padded.getField("xmin_pad") / 1000 * width).as("left"),
      (padded.getField("ymin_pad") / 1000 * height).as("top"),
      (padded.getField("xmax_pad") / 1000 * width).as("right"),
      (padded.getField("ymax_pad") / 1000 * height).as("bottom"))

  /** DuckDB twins; `b` is a 4-int-list SQL expression. Each returns one
    * coordinate expression so oracle SQL can alias them individually.
    */
  def padClampSql(b: String): Map[String, String] = {
    val (ymin, xmin, ymax, xmax) =
      (s"CAST($b[1] AS DOUBLE)", s"CAST($b[2] AS DOUBLE)",
        s"CAST($b[3] AS DOUBLE)", s"CAST($b[4] AS DOUBLE)")
    val bw = s"($xmax - $xmin)"
    val bh = s"($ymax - $ymin)"
    Map(
      "xmin_pad" -> s"greatest(0.0, $xmin - $bw * $PaddingPercent)",
      "ymin_pad" -> s"greatest(0.0, $ymin - $bh * $PaddingPercent)",
      "xmax_pad" -> s"least(1000.0, $xmax + $bw * $PaddingPercent)",
      "ymax_pad" -> s"least(1000.0, $ymax + $bh * $PaddingPercent)")
  }

  def toPixelSql(coord: String, size: String): String =
    s"($coord / 1000 * $size)"
}
