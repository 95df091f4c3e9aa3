package graft.queries

import graft.Tables
import graft.operators.{Histogram, Stats}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Statistics + histogram queries (SURVEY.md §2 #15–20). */
object StatsQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // #15 df-statistics (unweighted).
    "q_stats" -> ((s, dir) =>
      Stats.statistics(Tables.lineitem(s, dir), "l_extendedprice")),

    // #16 df-statistics with a weight series (elapsed-time weighting).
    "q_weighted_stats" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .withColumn("elapsed", col("eps_us").cast("double") / 1000000.0)
      Stats.weightedStatistics(e, None, Seq(col("elapsed"), col("event_id")), "value", "elapsed")
    }),

    // #17 df-quantile (exact, linear interpolation).
    "q_quantile" -> ((s, dir) =>
      Stats.quantiles(Tables.lineitem(s, dir), "l_quantity", Seq(0.0, 0.25, 0.5, 0.75, 1.0))
        .orderBy("q")),

    // #17b approximate quantiles — the single-pass mergeable-sketch
    // path a 100 TB series needs. Sketch cut points are
    // engine-specific, so the oracle checks the BOUND, not the value:
    // the query emits each cut point's exact admissible value window
    // (percentile_disc at q ± 2/accuracy — exact data elements) plus
    // within=true, and DuckDB recomputes the window independently.
    // Precondition ε·n ≥ 2 ⇒ n ≥ 20000 rows (holds from sf0.01 up).
    "q_quantile_approx" -> ((s, dir) =>
      Stats.quantilesApproxChecked(Tables.lineitem(s, dir), "l_extendedprice",
          Seq(0.01, 0.25, 0.5, 0.75, 0.99), accuracy = 10000)
        .orderBy("q")),

    // #19 df-histogram (unweighted, dense bucket range).
    "q_histogram" -> ((s, dir) =>
      Histogram.histogram(Tables.lineitem(s, dir), "l_quantity", 5.0)
        .orderBy("bucket_start")),

    // #19b categorical histogram (string series, as-percentage).
    "q_histogram_cat" -> ((s, dir) =>
      Histogram.categorical(Tables.events(s, dir), "event_type", asPercentage = true)
        .orderBy("bucket")),

    // #20 weighted histogram, as-percentage.
    "q_histogram_weighted" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .withColumn("elapsed", col("eps_us").cast("double") / 1000000.0)
      val pairs = Stats.weightedPairs(e, None, Seq(col("elapsed"), col("event_id")), "value", "elapsed")
      Histogram.weightedHistogram(pairs, 10.0, includeZeroes = true, asPercentage = true)
        .orderBy("bucket_start")
    }),
  )

  val oracle: Map[String, String] = Map(
    "q_stats" ->
      """SELECT count(l_extendedprice) AS cnt, round(avg(l_extendedprice),4) AS mean,
        | round(stddev_samp(l_extendedprice),4) AS stddev,
        | round(min(l_extendedprice),4) AS min, round(max(l_extendedprice),4) AS max
        |FROM lineitem""".stripMargin,

    "q_weighted_stats" ->
      """WITH s AS (SELECT epoch_us(ts)/1000000.0 AS w, value AS v, event_id FROM events),
        |p AS (SELECT w, v, lag(v) OVER (ORDER BY w, event_id) AS pv,
        |             lag(w) OVER (ORDER BY w, event_id) AS pw FROM s),
        |q AS (SELECT (pv+v)/2 AS wx, w-pw AS ww FROM p WHERE pv IS NOT NULL AND v IS NOT NULL AND w > pw)
        |SELECT count(*) AS cnt,
        | round(sum(wx*ww)/sum(ww),4) AS wmean,
        | round(sqrt(sum(wx*wx*ww)/sum(ww) - pow(sum(wx*ww)/sum(ww),2)),4) AS wstddev,
        | round(sum(ww),4) AS total_weight
        |FROM q""".stripMargin,

    // bound oracle: recompute each sketch cut point's exact admissible
    // window (value at rank ⌈p·n⌉, SQL-standard percentile_disc =
    // DuckDB quantile_disc — probed identical to Spark's
    // percentile_disc at all 10 probabilities) and assert the Spark
    // side's within flag. lo/hi are exact data elements, so the hash
    // compares raw doubles; `within` must come back true.
    // Probes are EXPLICIT ranks k = ceil(p·n) computed in exact
    // DECIMAL arithmetic and read by row_number — no engine percentile
    // function's internal double rank math. Probing quantile_disc at
    // the raw p failed at sf1 (n = 6,000,000): 0.0102·n = 61200
    // exactly, but the double read 61200.00000000001 and the engines
    // ceiled to different ranks (Spark 61201, DuckDB 61200) —
    // adjacent, distinct elements. The Spark side
    // (Stats.quantilesApproxChecked) does the same count-then-exact-k
    // arithmetic in BigDecimal and probes percentile_disc at the
    // mid-interval probability (k − 0.5)/n, which rounding cannot
    // move off k.
    "q_quantile_approx" ->
      """WITH n AS (SELECT count(l_extendedprice) AS c FROM lineitem),
        |r AS (SELECT l_extendedprice AS v,
        |             row_number() OVER (ORDER BY l_extendedprice) AS rn FROM lineitem)
        |SELECT q, lo, hi, true AS within FROM (
        | SELECT cast(0.01 as double) AS q,
        |        (SELECT v FROM r, n WHERE rn = ceil(0.0098::DECIMAL(18,6) * c)) AS lo,
        |        (SELECT v FROM r, n WHERE rn = ceil(0.0102::DECIMAL(18,6) * c)) AS hi
        | UNION ALL SELECT 0.25,
        |        (SELECT v FROM r, n WHERE rn = ceil(0.2498::DECIMAL(18,6) * c)),
        |        (SELECT v FROM r, n WHERE rn = ceil(0.2502::DECIMAL(18,6) * c))
        | UNION ALL SELECT 0.5,
        |        (SELECT v FROM r, n WHERE rn = ceil(0.4998::DECIMAL(18,6) * c)),
        |        (SELECT v FROM r, n WHERE rn = ceil(0.5002::DECIMAL(18,6) * c))
        | UNION ALL SELECT 0.75,
        |        (SELECT v FROM r, n WHERE rn = ceil(0.7498::DECIMAL(18,6) * c)),
        |        (SELECT v FROM r, n WHERE rn = ceil(0.7502::DECIMAL(18,6) * c))
        | UNION ALL SELECT 0.99,
        |        (SELECT v FROM r, n WHERE rn = ceil(0.9898::DECIMAL(18,6) * c)),
        |        (SELECT v FROM r, n WHERE rn = ceil(0.9902::DECIMAL(18,6) * c))
        |) ORDER BY q""".stripMargin,

    "q_quantile" ->
      """SELECT q, value FROM (
        | SELECT cast(0.0 as double) AS q, round(quantile_cont(l_quantity, 0.0),4) AS value FROM lineitem
        | UNION ALL SELECT 0.25, round(quantile_cont(l_quantity, 0.25),4) FROM lineitem
        | UNION ALL SELECT 0.5, round(quantile_cont(l_quantity, 0.5),4) FROM lineitem
        | UNION ALL SELECT 0.75, round(quantile_cont(l_quantity, 0.75),4) FROM lineitem
        | UNION ALL SELECT 1.0, round(quantile_cont(l_quantity, 1.0),4) FROM lineitem
        |) ORDER BY q""".stripMargin,

    "q_histogram" ->
      """WITH sparse AS (
        |  SELECT cast(trunc(l_quantity/5.0) as bigint) AS b, cast(count(*) as double) AS r
        |  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1),
        |bounds AS (SELECT min(b) AS lo, max(b) AS hi, sum(r) AS total FROM sparse),
        |dense AS (SELECT unnest(generate_series(lo, hi)) AS b, total FROM bounds)
        |SELECT cast(b*5.0 as double) AS bucket_start, round(coalesce(r, 0.0),4) AS "rank"
        |FROM dense LEFT JOIN sparse USING (b) ORDER BY bucket_start""".stripMargin,

    "q_histogram_cat" ->
      """SELECT event_type AS bucket,
        | round(count(*) * 100.0 / (SELECT count(*) FROM events WHERE event_type IS NOT NULL), 4) AS "rank"
        |FROM events WHERE event_type IS NOT NULL
        |GROUP BY event_type ORDER BY bucket""".stripMargin,

    "q_histogram_weighted" ->
      """WITH s AS (SELECT epoch_us(ts)/1000000.0 AS w, value AS v, event_id FROM events),
        |p AS (SELECT w, v, lag(v) OVER (ORDER BY w, event_id) AS pv,
        |             lag(w) OVER (ORDER BY w, event_id) AS pw FROM s),
        |q AS (SELECT (pv+v)/2 AS wx, w-pw AS ww FROM p WHERE pv IS NOT NULL AND v IS NOT NULL AND w > pw),
        |sparse AS (SELECT cast(trunc(wx/10.0) as bigint) AS b, sum(ww) AS r FROM q GROUP BY 1),
        |bounds AS (SELECT min(b) AS lo, max(b) AS hi, sum(r) AS total FROM sparse),
        |dense AS (SELECT unnest(generate_series(lo, hi)) AS b, total FROM bounds)
        |SELECT cast(b*10.0 as double) AS bucket_start,
        | round(CASE WHEN total > 0 THEN coalesce(r,0.0)*100.0/total ELSE 0.0 END, 4) AS "rank"
        |FROM dense LEFT JOIN sparse USING (b) ORDER BY bucket_start""".stripMargin,
  )
}
