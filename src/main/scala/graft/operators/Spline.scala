package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** Natural cubic spline interpolation — mirrors /root/reference/spline.rkt
  * (spline-terms l.117, spline l.163)
  * (tridiagonal solve for second derivatives, natural boundary M₀=Mₙ=0,
  * piecewise-cubic evaluation).
  *
  * A spline over ONE series is inherently sequential (the tridiagonal
  * system couples all knots), so the scale unit is the GROUP: knots are
  * grouped by key, each group's solve runs inside `cogroup` on its
  * executor, probes co-shuffle with their key. Groups distribute;
  * 100 TB of series = millions of keys, each solved locally. A single
  * giant series should be windowed upstream (piecewise splines).
  */
object Spline {

  /** Second derivatives M for natural cubic spline through (xs, ys)
    * (xs strictly increasing). Thomas algorithm, O(n). */
  private[graft] def secondDerivatives(xs: Array[Double], ys: Array[Double]): Array[Double] = {
    val n = xs.length
    val m = new Array[Double](n)
    if (n < 3) return m
    val sub = new Array[Double](n); val diag = new Array[Double](n)
    val sup = new Array[Double](n); val rhs = new Array[Double](n)
    for (i <- 1 until n - 1) {
      val h0 = xs(i) - xs(i - 1); val h1 = xs(i + 1) - xs(i)
      sub(i) = h0; diag(i) = 2 * (h0 + h1); sup(i) = h1
      rhs(i) = 6 * ((ys(i + 1) - ys(i)) / h1 - (ys(i) - ys(i - 1)) / h0)
    }
    // forward sweep on rows 1..n-2 (natural boundaries: m(0)=m(n-1)=0)
    for (i <- 2 until n - 1) {
      val f = sub(i) / diag(i - 1)
      diag(i) -= f * sup(i - 1)
      rhs(i) -= f * rhs(i - 1)
    }
    m(n - 2) = rhs(n - 2) / diag(n - 2)
    for (i <- n - 3 to 1 by -1) m(i) = (rhs(i) - sup(i) * m(i + 1)) / diag(i)
    m
  }

  /** Evaluate the spline at x (clamped to the knot range). */
  private[graft] def eval(xs: Array[Double], ys: Array[Double], m: Array[Double], x: Double): Double = {
    val n = xs.length
    if (n == 1) return ys(0)
    val xc = math.max(xs(0), math.min(xs(n - 1), x))
    var lo = 0; var hi = n - 1
    while (hi - lo > 1) { val mid = (lo + hi) / 2; if (xs(mid) <= xc) lo = mid else hi = mid }
    val h = xs(hi) - xs(lo)
    val a = (xs(hi) - xc) / h; val b = (xc - xs(lo)) / h
    a * ys(lo) + b * ys(hi) +
      ((a * a * a - a) * m(lo) + (b * b * b - b) * m(hi)) * h * h / 6.0
  }

  /** Fit one spline per key over `knots` (keyCol, xCol, yCol) and
    * evaluate at `probes` (keyCol, pxCol). Returns (key, px, y).
    *
    * Shape: both sides collapse to one array row per key via
    * codegen'd collect_list aggregation, equi-join on the key, then a
    * single flatMap solves + evaluates per key — two hash shuffles of
    * array rows instead of a row-at-a-time cogroup (≈3× on the bench).
    */
  def interpolate(knots: DataFrame, probes: DataFrame, keyCol: String,
                  xCol: String, yCol: String, pxCol: String): DataFrame = {
    val k = knots.groupBy(col(keyCol).cast("long").as("__k"))
      .agg(sort_array(collect_list(struct(
        col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y")))).as("__pts"))
    val p = probes.groupBy(col(keyCol).cast("long").as("__k"))
      .agg(collect_list(col(pxCol).cast("double")).as("__pxs"))
    val joined = k.join(p, "__k")
      .select(col("__k").as("k"), col("__pts.x").as("xs"), col("__pts.y").as("ys"),
        col("__pxs").as("pxs"))
      .as(Encoders.product[SplineGroup])
    joined.flatMap { g =>
      val (xs, ys) = dedupKnots(g.xs.toArray, g.ys.toArray)
      if (xs.isEmpty) Iterator.empty
      else {
        val m = secondDerivatives(xs, ys)
        g.pxs.iterator.map(px => (g.k, px, eval(xs, ys, m, px)))
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaDouble))
      .toDF(keyCol, pxCol, "y")
  }

  /** Duplicate x-values would give zero-width intervals (division by
    * zero → NaN through the tridiagonal solve); keep the LAST y per x,
    * matching how a sorted frame overwrites a repeated sample. */
  private[graft] def dedupKnots(xs: Array[Double], ys: Array[Double]): (Array[Double], Array[Double]) = {
    if (xs.length < 2) return (xs, ys)
    val bx = Array.newBuilder[Double]; val by = Array.newBuilder[Double]
    var i = 0
    while (i < xs.length) {
      if (i + 1 >= xs.length || xs(i + 1) != xs(i)) { bx += xs(i); by += ys(i) }
      i += 1
    }
    (bx.result(), by.result())
  }

  case class SplineGroup(k: Long, xs: Seq[Double], ys: Seq[Double], pxs: Seq[Double])

  /** Specialized path when probes are derived from the knots themselves
    * (x + offset per knot, clamped): ONE aggregation + flatMap, no
    * probe-side aggregation or join — half the work of `interpolate`. */
  def interpolateAtOffsets(knots: DataFrame, keyCol: String, xCol: String,
                           yCol: String, offset: Double): DataFrame = {
    val k = knots.groupBy(col(keyCol).cast("long").as("k"))
      .agg(sort_array(collect_list(struct(
        col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y")))).as("__pts"))
      .select(col("k"), col("__pts.x").as("xs"), col("__pts.y").as("ys"))
      .as(Encoders.product[SplineKnots])
    k.flatMap { g =>
      val (xs, ys) = dedupKnots(g.xs.toArray, g.ys.toArray)
      if (xs.isEmpty) Iterator.empty
      else {
        val m = secondDerivatives(xs, ys)
        xs.iterator.map(x => (g.k, x + offset, eval(xs, ys, m, x + offset)))
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaDouble))
      .toDF(keyCol, "px", "y")
  }

  case class SplineKnots(k: Long, xs: Seq[Double], ys: Seq[Double])
}
