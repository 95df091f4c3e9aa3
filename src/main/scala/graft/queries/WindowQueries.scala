package graft.queries

import graft.Tables
import graft.operators.{Lookup, MeanMax}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-series / window queries (SURVEY.md §2 #8, #22–25):
  * interpolated lookup, mean-max, time-delay, 2-D sample grouping.
  *
  * All keyed on `user_id` so window state distributes; epoch columns
  * come from µs-precision timestamps (the oracle truncates DuckDB's ns
  * timestamps to µs to match Spark's timestamp semantics).
  */
object WindowQueries {

  type Q = (SparkSession, String) => DataFrame

  private def withEps(df: DataFrame): DataFrame =
    df.withColumn("eps", col("eps_us").cast("double") / 1000000.0)

  val queries: Map[String, Q] = Map(
    // #8 df-lookup/interpolated: per-user probe grid at 1/10 span
    // steps. The probe set grows with the key count, so the registered
    // plan is the co-partitioned merge (no probe broadcast); the
    // broadcast range-join formulation is its spec-level cross-check.
    "q_interp_lookup" -> ((s, dir) => {
      val e = withEps(Tables.events(s, dir))
      val probes = e.groupBy("user_id")
        .agg(min(col("eps")).as("lo"), max(col("eps")).as("hi"))
        .select(col("user_id"), explode(sequence(lit(1), lit(9))).as("k"), col("lo"), col("hi"))
        .select(col("user_id"), col("k"),
          (col("lo") + col("k") * (col("hi") - col("lo")) / 10.0).as("probe"))
      Lookup.interpolatedMerge(e, probes, "user_id", "eps", "value", "probe",
          carryCols = Seq("k"))
        .select(col("user_id"), col("k"), round(col("interp"), 4).as("interp"))
        .orderBy("user_id", "k")
    }),

    // #22 df-mean-max: best exact-duration trapezoid-average per
    // duration (reference get-mean-max semantics). Integer-µs axis so
    // window-boundary comparisons are exact across engines.
    "q_meanmax" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      MeanMax.meanMax(e, "user_id", "eps_us", "value",
          Seq(60L, 300L, 1800L, 7200L).map(_ * 1000000L))
        .select((col("duration") / 1000000L).cast("long").as("duration"), col("best_avg"))
        .orderBy("duration")
    }),

    // #22b df-mean-max inverted: best = smallest window average
    // (pace/ground-contact-style series).
    "q_meanmax_inv" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      MeanMax.meanMax(e, "user_id", "eps_us", "value",
          Seq(60L, 1800L).map(_ * 1000000L), inverted = true)
        .select((col("duration") / 1000000L).cast("long").as("duration"), col("best_avg"))
        .orderBy("duration")
    }),

    // #22c df-mean-max-aux: auxiliary series' average over the main
    // series' best window (aux = props length as a second telemetry
    // channel).
    "q_meanmax_aux" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .withColumn("aux", length(col("props")).cast("double"))
      MeanMax.meanMaxAux(e, "user_id", "eps_us", "value", "aux",
          Seq(300L, 1800L).map(_ * 1000000L))
        .select((col("duration") / 1000000L).cast("long").as("duration"),
          col("best_avg"), col("aux_avg"))
        .orderBy("duration")
    }),

    // #23 time-delay-series: value at first sample >= ts + 60s, per
    // user — via the co-partitioned as-of merge join (AsOf), which the
    // oracle-checked pair-join formulation validates.
    "q_time_delay" -> ((s, dir) => {
      val e = withEps(Tables.events(s, dir))
      graft.operators.AsOf.forwardJoin(e, "user_id", "eps", "value", "event_id", 60.0)
        .select(col("user_id"), col("event_id"), round(col("delayed_value"), 4).as("delayed_value"))
        .orderBy("user_id", "event_id")
    }),

    // #24 group-samples: 2-D grid binning of (quantity, price).
    "q_group_samples" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(floor(col("l_quantity") / 5).cast("long").as("xb"),
          floor(col("l_extendedprice") / 10000).cast("long").as("yb"))
        .groupBy("xb", "yb").agg(count(lit(1)).as("cnt"))
        .orderBy("xb", "yb")),

    // #25 group-samples/factor: factor-keyed grouping.
    "q_group_factor" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), round(avg("value"), 4).as("mean_value"),
          round(sum("value"), 2).as("sum_value"))
        .orderBy("event_type")),
  )

  val oracle: Map[String, String] = Map(
    "q_interp_lookup" ->
      """WITH e AS (SELECT user_id, epoch_us(ts)/1000000.0 AS eps, value FROM events),
        |seg AS (SELECT user_id, eps AS t0, value AS v0,
        |        lead(eps) OVER (PARTITION BY user_id ORDER BY eps) AS t1,
        |        lead(value) OVER (PARTITION BY user_id ORDER BY eps) AS v1 FROM e),
        |b AS (SELECT user_id, min(eps) AS lo, max(eps) AS hi FROM e GROUP BY user_id),
        |probes AS (SELECT user_id, k, lo + k*(hi-lo)/10.0 AS probe
        |           FROM b, (SELECT unnest(generate_series(1,9)) AS k) ks)
        |SELECT p.user_id, cast(p.k as int) AS k,
        | round(s.v0 + (s.v1-s.v0)*(p.probe-s.t0)/(s.t1-s.t0),4) AS interp
        |FROM probes p JOIN seg s
        |  ON p.user_id = s.user_id AND s.t1 IS NOT NULL AND p.probe >= s.t0 AND p.probe < s.t1
        |ORDER BY p.user_id, k""".stripMargin,

    // Trapezoid integral over exact-length windows, partial final slice
    // prorated, full-coverage only — mirrors meanmax.rkt get-mean-max.
    // Operation order matches the Scala kernel so doubles agree bitwise:
    // slice = dt*(y1+y2)/2; total = (cum_j + slice_j*frac) - cum_a.
    "q_meanmax" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS x, value FROM events
        |           WHERE ts IS NOT NULL AND value IS NOT NULL),
        |s AS (SELECT user_id, x, value,
        |      lead(x) OVER w AS nx, lead(value) OVER w AS nv
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY x)),
        |d AS (SELECT user_id, x AS x1, nx AS x2, (nx - x) AS dt,
        |      (nx - x) * (value + nv) / 2 AS slice FROM s WHERE nx IS NOT NULL),
        |c AS (SELECT *, sum(slice) OVER (PARTITION BY user_id ORDER BY x1
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - slice AS cum FROM d),
        |durs AS (SELECT cast(unnest([60,300,1800,7200]) AS BIGINT) AS dsec),
        |tot AS (SELECT du.dsec,
        |        (j.cum + j.slice * ((a.x1 + du.dsec*1000000 - j.x1) / (j.dt * 1.0))
        |          - a.cum) / (du.dsec*1000000) AS mavg
        |        FROM c a JOIN durs du ON true
        |        JOIN c j ON j.user_id = a.user_id
        |          AND j.x1 < a.x1 + du.dsec*1000000
        |          AND a.x1 + du.dsec*1000000 <= j.x2)
        |SELECT cast(dsec AS bigint) AS duration, round(max(mavg),4) AS best_avg
        |FROM tot GROUP BY dsec ORDER BY duration""".stripMargin,

    "q_meanmax_inv" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS x, value FROM events
        |           WHERE ts IS NOT NULL AND value IS NOT NULL),
        |s AS (SELECT user_id, x, value,
        |      lead(x) OVER w AS nx, lead(value) OVER w AS nv
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY x)),
        |d AS (SELECT user_id, x AS x1, nx AS x2, (nx - x) AS dt,
        |      (nx - x) * (value + nv) / 2 AS slice FROM s WHERE nx IS NOT NULL),
        |c AS (SELECT *, sum(slice) OVER (PARTITION BY user_id ORDER BY x1
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - slice AS cum FROM d),
        |durs AS (SELECT cast(unnest([60,1800]) AS BIGINT) AS dsec),
        |tot AS (SELECT du.dsec,
        |        (j.cum + j.slice * ((a.x1 + du.dsec*1000000 - j.x1) / (j.dt * 1.0))
        |          - a.cum) / (du.dsec*1000000) AS mavg
        |        FROM c a JOIN durs du ON true
        |        JOIN c j ON j.user_id = a.user_id
        |          AND j.x1 < a.x1 + du.dsec*1000000
        |          AND a.x1 + du.dsec*1000000 <= j.x2)
        |SELECT cast(dsec AS bigint) AS duration, round(min(mavg),4) AS best_avg
        |FROM tot GROUP BY dsec ORDER BY duration""".stripMargin,

    // Same delta-series machinery with a parallel aux cumsum; the
    // winner row (argmax by total, ties x1 then user) supplies both
    // averages — operation order mirrors the Scala kernel bitwise.
    "q_meanmax_aux" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS x, value,
        |             cast(length(props) AS double) AS aux FROM events
        |           WHERE ts IS NOT NULL AND value IS NOT NULL),
        |s AS (SELECT user_id, x, value, aux,
        |      lead(x) OVER w AS nx, lead(value) OVER w AS nv, lead(aux) OVER w AS na
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY x)),
        |d AS (SELECT user_id, x AS x1, nx AS x2, (nx - x) AS dt,
        |      (nx - x) * (value + nv) / 2 AS slice,
        |      CASE WHEN aux IS NOT NULL AND na IS NOT NULL
        |           THEN (nx - x) * (aux + na) / 2 ELSE 0.0 END AS aslice,
        |      CASE WHEN aux IS NOT NULL AND na IS NOT NULL
        |           THEN cast(nx - x AS double) ELSE 0.0 END AS adt
        |      FROM s WHERE nx IS NOT NULL),
        |c AS (SELECT *, sum(slice) OVER pw - slice AS cum,
        |             sum(aslice) OVER pw - aslice AS acum,
        |             sum(adt) OVER pw - adt AS atcum
        |      FROM d WINDOW pw AS (PARTITION BY user_id ORDER BY x1
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |durs AS (SELECT cast(unnest([300,1800]) AS BIGINT) AS dsec),
        |tot AS (SELECT du.dsec, a.user_id, a.x1,
        |        (j.cum + j.slice * ((a.x1 + du.dsec*1000000 - j.x1) / (j.dt * 1.0)) - a.cum) AS total,
        |        (j.acum + j.aslice * ((a.x1 + du.dsec*1000000 - j.x1) / (j.dt * 1.0)) - a.acum) AS atotal,
        |        (j.atcum + j.adt * ((a.x1 + du.dsec*1000000 - j.x1) / (j.dt * 1.0)) - a.atcum) AS atime
        |        FROM c a JOIN durs du ON true
        |        JOIN c j ON j.user_id = a.user_id
        |          AND j.x1 < a.x1 + du.dsec*1000000
        |          AND a.x1 + du.dsec*1000000 <= j.x2),
        |sel AS (SELECT dsec, total, atotal, atime,
        |        row_number() OVER (PARTITION BY dsec ORDER BY total DESC, x1, user_id) AS rn
        |        FROM tot)
        |SELECT cast(dsec AS bigint) AS duration,
        |  round(total/(dsec*1000000),4) AS best_avg,
        |  round(CASE WHEN atime > 0 THEN atotal/atime END, 4) AS aux_avg
        |FROM sel WHERE rn = 1 ORDER BY duration""".stripMargin,

    "q_time_delay" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts)/1000000.0 AS eps, value FROM events),
        |j AS (SELECT e1.user_id, e1.event_id, e2.value AS v2,
        |  row_number() OVER (PARTITION BY e1.user_id, e1.event_id ORDER BY e2.eps, e2.event_id) AS rn
        |  FROM e e1 JOIN e e2 ON e1.user_id = e2.user_id AND e2.eps >= e1.eps + 60.0)
        |SELECT user_id, event_id, round(v2,4) AS delayed_value
        |FROM j WHERE rn = 1 ORDER BY user_id, event_id""".stripMargin,

    "q_group_samples" ->
      """SELECT cast(floor(l_quantity/5) as bigint) AS xb,
        | cast(floor(l_extendedprice/10000) as bigint) AS yb, count(*) AS cnt
        |FROM lineitem GROUP BY 1, 2 ORDER BY xb, yb""".stripMargin,

    "q_group_factor" ->
      """SELECT event_type, count(*) AS cnt, round(avg(value),4) AS mean_value,
        | round(sum(value),2) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
