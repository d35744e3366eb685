package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Geometry expectations hand-computed from the reference formula
  * (`cropper/pnp-cropperLambda.py:65-82`): [ymin,xmin,ymax,xmax], pad 10%
  * of box w/h, clamp [0,1000], scale by size/1000.
  */
class BboxOpsSpec extends SparkTestBase {

  private def geom(b: Seq[Int], w: Double, h: Double): (Seq[Double], Seq[Double]) = {
    import spark.implicits._
    val padded = BboxOps.padClamp(col("b"))
    val px = BboxOps.toPixels(padded, lit(w), lit(h))
    val r = Seq(Tuple1(b)).toDF("b").select(padded.as("p"), px.as("x")).collect()(0)
    val p = r.getStruct(0); val x = r.getStruct(1)
    ((0 until 4).map(p.getDouble), (0 until 4).map(x.getDouble))
  }

  test("interior box pads by 10% of its own extent") {
    // bbox [ymin=120, xmin=40, ymax=340, xmax=260]: w=220, h=220, pad=22
    val (p, px) = geom(Seq(120, 40, 340, 260), 1000.0, 2000.0)
    assert(p === Seq(18.0, 98.0, 282.0, 362.0)) // xmin,ymin,xmax,ymax padded
    assert(px === Seq(18.0, 196.0, 282.0, 724.0)) // left,top,right,bottom
  }

  test("full-page box clamps to [0,1000]") {
    val (p, _) = geom(Seq(0, 0, 1000, 1000), 248.0, 350.0)
    assert(p === Seq(0.0, 0.0, 1000.0, 1000.0))
  }

  test("validity filter: null, wrong-arity, and null-element boxes are rejected") {
    import spark.implicits._
    val df = Seq(
      (1, Some(Seq[Option[Int]](Some(1), Some(2), Some(3), Some(4)))),
      (2, Some(Seq[Option[Int]](Some(1), Some(2), Some(3)))),
      (3, Option.empty[Seq[Option[Int]]]),
      // a null COORDINATE must invalidate the box: greatest/least skip
      // nulls, so padClamp would fabricate the missing side to the full
      // page extent (0/1000) instead of propagating the null
      (4, Some(Seq[Option[Int]](None, Some(100), None, Some(300)))))
      .toDF("id", "b")
    assert(df.filter(BboxOps.isValid(col("b"))).select("id")
      .collect().map(_.getInt(0)).toSeq === Seq(1))
  }

  test("property: padded coords stay in [0,1000] and preserve ordering for non-degenerate boxes") {
    val boxGen = for {
      ymin <- Gen.choose(0, 999); xmin <- Gen.choose(0, 999)
      ymax <- Gen.choose(ymin + 1, 1000); xmax <- Gen.choose(xmin + 1, 1000)
    } yield Seq(ymin, xmin, ymax, xmax)
    val boxes = Gen.listOfN(250, boxGen)
      .pureApply(Gen.Parameters.default, Seed(42L)) :+ Seq(0, 0, 1000, 1000)
    import spark.implicits._
    boxes.map(Tuple1(_)).toDF("b")
      .select(BboxOps.padClamp(col("b")).as("p")).collect().foreach { r =>
        val p = r.getStruct(0)
        (0 until 4).foreach(i => assert(p.getDouble(i) >= 0.0 && p.getDouble(i) <= 1000.0))
        assert(p.getDouble(0) <= p.getDouble(2)) // xmin_pad <= xmax_pad
        assert(p.getDouble(1) <= p.getDouble(3)) // ymin_pad <= ymax_pad
      }
  }
}
