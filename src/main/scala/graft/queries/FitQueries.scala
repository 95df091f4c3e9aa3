package graft.queries

import graft.Tables
import graft.operators.Fit
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Least-squares fit queries (SURVEY.md §2 #26–31). All single-pass
  * distributed aggregations; oracle uses DuckDB's regr_* / explicit
  * Cramer solve on the same power sums. */
object FitQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q_fit_linear" -> ((s, dir) =>
      Fit.linear(Tables.lineitem(s, dir), "l_quantity", "l_extendedprice")),

    "q_fit_poly" -> ((s, dir) =>
      Fit.polynomial(Tables.lineitem(s, dir), "l_quantity", "l_extendedprice", 2)
        .select(col("degree"), round(col("coef"), 2).as("coef"))
        .orderBy("degree")),

    "q_fit_power" -> ((s, dir) =>
      Fit.power(Tables.lineitem(s, dir), "l_quantity", "l_extendedprice")),

    "q_fit_exp" -> ((s, dir) =>
      Fit.exponential(Tables.orders(s, dir), "o_custkey", "o_totalprice")),

    "q_fit_log" -> ((s, dir) =>
      Fit.logarithmic(Tables.lineitem(s, dir), "l_quantity", "l_extendedprice")),

    // #34 annealing-refined exponential fit — bound-oracled (the
    // q_quantile_approx pattern): the seeded RNG walk is
    // engine-specific, so the query emits the closed-form SLR SEED
    // params (DuckDB recomputes them exactly — same expressions as
    // q_fit_exp's oracle) plus within = (sse <= sse_seed), the
    // annealing improvement contract also spec'd in OperatorSpec.
    "q_fit_exp_annealed" -> ((s, dir) =>
      Fit.exponentialAnnealed(Tables.orders(s, dir), "o_custkey", "o_totalprice",
          iterations = 40)
        .select(round(col("a_seed"), 4).as("a_seed"),
          round(col("b_seed"), 4).as("b_seed"),
          (col("sse") <= col("sse_seed")).as("within"))),

    // #34b annealing-refined power-law fit (same bound-oracle contract
    // as q_fit_exp_annealed: reference find-better-power-law-coefficients)
    "q_fit_power_annealed" -> ((s, dir) =>
      Fit.powerAnnealed(Tables.lineitem(s, dir), "l_quantity", "l_extendedprice",
          iterations = 40)
        .select(round(col("a_seed"), 4).as("a_seed"),
          round(col("b_seed"), 4).as("b_seed"),
          (col("sse") <= col("sse_seed")).as("within"))),
  )

  val oracle: Map[String, String] = Map(
    "q_fit_linear" ->
      """WITH p AS (SELECT regr_slope(l_extendedprice, l_quantity) AS b,
        |  regr_intercept(l_extendedprice, l_quantity) AS a,
        |  regr_r2(l_extendedprice, l_quantity) AS r2 FROM lineitem)
        |SELECT 1 AS id, round(b,4) AS slope, round(a,4) AS intercept, round(r2,4) AS r2,
        | round(sqrt(avg(pow(l_extendedprice - (a + b*l_quantity), 2))),4) AS rmse
        |FROM lineitem, p GROUP BY b, a, r2""".stripMargin,

    "q_fit_poly" ->
      """WITH s AS (SELECT
        |  cast(count(*) as double) AS s0, sum(l_quantity) AS s1,
        |  sum(pow(l_quantity,2)) AS s2, sum(pow(l_quantity,3)) AS s3,
        |  sum(pow(l_quantity,4)) AS s4,
        |  sum(l_extendedprice) AS t0, sum(l_quantity*l_extendedprice) AS t1,
        |  sum(pow(l_quantity,2)*l_extendedprice) AS t2
        | FROM lineitem),
        |d AS (SELECT
        |  s0*(s2*s4-s3*s3) - s1*(s1*s4-s2*s3) + s2*(s1*s3-s2*s2) AS det,
        |  t0*(s2*s4-s3*s3) - s1*(t1*s4-s3*t2) + s2*(t1*s3-s2*t2) AS d0,
        |  s0*(t1*s4-t2*s3) - t0*(s1*s4-s2*s3) + s2*(s1*t2-s2*t1) AS d1,
        |  s0*(s2*t2-s3*t1) - s1*(s1*t2-s2*t1) + t0*(s1*s3-s2*s2) AS d2
        | FROM s)
        |SELECT degree, coef FROM (
        | SELECT 0 AS degree, round(d0/det, 2) AS coef FROM d
        | UNION ALL SELECT 1, round(d1/det, 2) FROM d
        | UNION ALL SELECT 2, round(d2/det, 2) FROM d
        |) ORDER BY degree""".stripMargin,

    "q_fit_power" ->
      """SELECT round(exp(regr_intercept(ln(l_extendedprice), ln(l_quantity))),4) AS a,
        | round(regr_slope(ln(l_extendedprice), ln(l_quantity)),4) AS b
        |FROM lineitem WHERE l_quantity > 0 AND l_extendedprice > 0""".stripMargin,

    "q_fit_exp" ->
      """SELECT round(exp(regr_intercept(ln(o_totalprice), o_custkey)),4) AS a,
        | round(regr_slope(ln(o_totalprice), o_custkey),4) AS b
        |FROM orders WHERE o_totalprice > 0""".stripMargin,

    "q_fit_log" ->
      """SELECT round(regr_intercept(l_extendedprice, ln(l_quantity)),4) AS a,
        | round(regr_slope(l_extendedprice, ln(l_quantity)),4) AS b
        |FROM lineitem WHERE l_quantity > 0""".stripMargin,

    // bound oracles: the deterministic SLR seed params cross-check
    // (identical expressions to q_fit_exp / q_fit_power); `within`
    // asserts the Spark-side annealing improvement flag
    "q_fit_exp_annealed" ->
      """SELECT round(exp(regr_intercept(ln(o_totalprice), o_custkey)),4) AS a_seed,
        | round(regr_slope(ln(o_totalprice), o_custkey),4) AS b_seed,
        | true AS within
        |FROM orders WHERE o_totalprice > 0""".stripMargin,

    "q_fit_power_annealed" ->
      """SELECT round(exp(regr_intercept(ln(l_extendedprice), ln(l_quantity))),4) AS a_seed,
        | round(regr_slope(ln(l_extendedprice), ln(l_quantity)),4) AS b_seed,
        | true AS within
        |FROM lineitem WHERE l_quantity > 0 AND l_extendedprice > 0""".stripMargin,
  )
}
