package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Least-squares fitting — mirrors
  * /root/reference/private/least-squares-fit.rkt (df-least-squares-fit
  * l.297) and slr.rkt (simple linear regression).
  *
  * linear:      y = a + b·x           (regr_* aggregates)
  * polynomial:  y = Σ cᵢ·xⁱ          (normal equations: distributed
  *                                     power-sums, tiny dense solve on
  *                                     the driver — O(deg²) numbers move)
  * power:       y = a·x^b            (SLR on ln x, ln y)
  * exponential: y = a·e^(b·x)        (SLR on x, ln y)
  * logarithmic: y = a + b·ln x       (SLR on ln x, y)
  *
  * All shapes reduce to ONE distributed aggregation; nothing per-row
  * ever reaches the driver, so they hold at 100 TB. The reference's
  * simulated-annealing refinement is in graft.operators.Annealing.
  */
object Fit {

  /** SLR with residuals: slope, intercept, r2, rmse (one pass + one
    * residual pass). */
  def linear(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val p = df.agg(
      expr(s"regr_slope($yCol, $xCol)").as("__b"),
      expr(s"regr_intercept($yCol, $xCol)").as("__a"),
      expr(s"regr_r2($yCol, $xCol)").as("__r2"))
    val row = p.first()
    if (row.isNullAt(0) || row.isNullAt(1)) {
      // degenerate series (n < 2 or zero x-variance): undefined fit
      val spark = df.sparkSession
      return spark.range(1).select(lit(1).as("id"),
        lit(null).cast("double").as("slope"), lit(null).cast("double").as("intercept"),
        lit(null).cast("double").as("r2"), lit(null).cast("double").as("rmse"))
    }
    val (b, a) = (row.getDouble(0), row.getDouble(1))
    df.agg(sqrt(avg(pow(col(yCol) - (lit(a) + lit(b) * col(xCol)), 2))).as("__rmse"))
      .select(lit(1).as("id"),
        round(lit(b), 4).as("slope"), round(lit(a), 4).as("intercept"),
        round(lit(row.getDouble(2)), 4).as("r2"), round(col("__rmse"), 4).as("rmse"))
  }

  /** Polynomial fit by normal equations. Output: (degree, coef) rows,
    * coef i multiplies x^i. */
  def polynomial(df: DataFrame, xCol: String, yCol: String, degree: Int): DataFrame = {
    val n = degree + 1
    // Power sums S_k = Σ x^k for k=0..2·degree and T_k = Σ x^k·y.
    val sums = (0 to 2 * degree).map(k => sum(pow(col(xCol), k)).as(s"s$k")) ++
      (0 to degree).map(k => sum(pow(col(xCol), k) * col(yCol)).as(s"t$k"))
    val row = df.agg(sums.head, sums.tail: _*).first()
    // degenerate input (empty / fewer points than coefficients): typed
    // null-coefficient rows, mirroring linear()'s guard
    if (row.isNullAt(0) || row.getDouble(0) < n) {
      val spark = df.sparkSession
      import spark.implicits._
      return (0 to degree).map(d => (d, Option.empty[Double])).toDF("degree", "coef")
    }
    val s = (0 to 2 * degree).map(k => row.getDouble(k)).toArray
    val t = (0 to degree).map(k => row.getDouble(2 * degree + 1 + k)).toArray
    // Solve (A c = t) where A[i][j] = S_{i+j}; tiny Gaussian elimination.
    val a = Array.tabulate(n, n)((i, j) => s(i + j))
    val c = solve(a, t)
    val spark = df.sparkSession
    import spark.implicits._
    c.zipWithIndex.map { case (v, i) => (i, v) }.toSeq.toDF("degree", "coef")
  }

  /** Gaussian elimination with partial pivoting (n <= ~8). */
  private[graft] def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    val m = a.map(_.clone())
    val y = b.clone()
    for (k <- 0 until n) {
      val piv = (k until n).maxBy(i => math.abs(m(i)(k)))
      val tmp = m(k); m(k) = m(piv); m(piv) = tmp
      val tb = y(k); y(k) = y(piv); y(piv) = tb
      for (i <- k + 1 until n) {
        val f = m(i)(k) / m(k)(k)
        for (j <- k until n) m(i)(j) -= f * m(k)(j)
        y(i) -= f * y(k)
      }
    }
    val x = new Array[Double](n)
    for (i <- n - 1 to 0 by -1) {
      var acc = y(i)
      for (j <- i + 1 until n) acc -= m(i)(j) * x(j)
      x(i) = acc / m(i)(i)
    }
    x
  }

  /** y = a·x^b — SLR in log-log space (x>0, y>0 rows only). */
  def power(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val d = df.filter(col(xCol) > 0 && col(yCol) > 0)
    d.agg(
      round(exp(expr(s"regr_intercept(ln($yCol), ln($xCol))")), 4).as("a"),
      round(expr(s"regr_slope(ln($yCol), ln($xCol))"), 4).as("b"))
  }

  /** y = a·e^(b·x) — SLR on (x, ln y). */
  def exponential(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val d = df.filter(col(yCol) > 0)
    d.agg(
      round(exp(expr(s"regr_intercept(ln($yCol), $xCol)")), 4).as("a"),
      round(expr(s"regr_slope(ln($yCol), $xCol)"), 4).as("b"))
  }

  /** y = a + b·ln x — SLR on (ln x, y). */
  def logarithmic(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val d = df.filter(col(xCol) > 0)
    d.agg(
      round(expr(s"regr_intercept($yCol, ln($xCol))"), 4).as("a"),
      round(expr(s"regr_slope($yCol, ln($xCol))"), 4).as("b"))
  }
}
