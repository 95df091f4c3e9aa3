package graft

import graft.operators.{Simplify, Spline}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NumericSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("spline interpolates knots exactly and is smooth between") {
    // natural spline through (0,0),(1,1),(2,0): 4·M₁ = 6·(-1-1) → M₁ = -3
    assert(Spline.secondDerivatives(Array(0, 1, 2), Array(0, 1, 0)).apply(1) == -3.0)
    val knots = Seq((1L, 0.0, 0.0), (1L, 1.0, 1.0), (1L, 2.0, 0.0)).toDF("k", "x", "y")
    val probes = Seq((1L, 0.0), (1L, 0.5), (1L, 1.0), (1L, 5.0)).toDF("k", "px")
    val r = Spline.interpolate(knots, probes, "k", "x", "y", "px")
      .orderBy("px").collect().map(_.getDouble(2))
    assert(r(0) == 0.0 && r(2) == 1.0) // knots hit exactly
    assert(r(1) > 0.5 && r(1) < 0.7)   // convex bump between
    assert(r(3) == 0.0)                // clamped to range end
  }

  test("RDP keeps endpoints and the farthest deviator") {
    val xs = Array(0.0, 1.0, 2.0, 3.0, 4.0)
    val ys = Array(0.0, 0.1, 5.0, 0.1, 0.0)
    val kept = Simplify.rdpKeepIndices(xs, ys, epsilon = 1.0)
    assert(kept.contains(0) && kept.contains(4) && kept.contains(2))
    assert(!kept.contains(1) && !kept.contains(3))
    // keep-positions forces a survivor
    val forced = Simplify.rdpKeepIndices(xs, ys, epsilon = 1.0, keep = Set(1))
    assert(forced.contains(1))
  }

  test("RDP dataframe op simplifies straight segments away") {
    val line = (0 to 100).map(i => (7L, i.toDouble, 2.0 * i)).toDF("k", "x", "y")
    val out = Simplify.rdp(line, "k", "x", "y", epsilon = 0.01)
    assert(out.count() == 2) // a straight line collapses to endpoints
  }
}
