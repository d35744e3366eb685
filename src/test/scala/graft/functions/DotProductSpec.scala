package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DotProductSpec extends SparkTestBase {

  private def viaSql(a: Seq[Double], b: Seq[Double]): java.lang.Double = {
    VectorOps.register(spark)
    import spark.implicits._
    val r = Seq((a, b)).toDF("a", "b")
      .select(expr("graft_dot(a, b)")).collect()(0)
    if (r.isNullAt(0)) null else r.getDouble(0)
  }

  test("matches the sequential fold exactly (same summation order)") {
    val a = Seq(0.1, 0.2, 0.3, 1e-9)
    val b = Seq(3.0, -2.5, 0.25, 1e9)
    val fold = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    assert(viaSql(a, b) === fold)
  }

  test("interpreted eval equals codegen result") {
    val a = Seq(1.5, -2.0, 4.25)
    val b = Seq(0.5, 3.0, -1.0)
    // eval() path (interpreted, what nullSafeEval runs)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val interp = DotProduct(
      Literal.create(ArrayData.toArrayData(a.toArray), ArrayType(DoubleType)),
      Literal.create(ArrayData.toArrayData(b.toArray), ArrayType(DoubleType))).eval(null)
    assert(interp === viaSql(a, b)) // viaSql goes through whole-stage codegen
  }

  test("null array yields null; length mismatch yields null like the built-in chain") {
    assert(viaSql(null, Seq(1.0)) === null)
    // aggregate(zip_with(a, b, (x,y) -> x*y), ...) null-pads the shorter
    // side and the fold propagates the null — a truncated partial sum
    // would silently score a malformed embedding row
    assert(viaSql(Seq(2.0, 3.0), Seq(10.0)) === null)
    val builtin = {
      import spark.implicits._
      val r = Seq((Seq(2.0, 3.0), Seq(10.0))).toDF("a", "b")
        .select(expr(
          "aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"))
        .collect()(0)
      if (r.isNullAt(0)) null else r.getDouble(0)
    }
    assert(builtin === null, "built-in chain changed semantics")
  }

  test("rejects non-double-array inputs at analysis time") {
    VectorOps.register(spark)
    import spark.implicits._
    val err = intercept[Exception] {
      Seq(("x", "y")).toDF("a", "b").select(expr("graft_dot(a, b)")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("array"))
  }
}
