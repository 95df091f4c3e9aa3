package graft.queries

import graft.Tables
import graft.operators.{Simplify, Spline, Stats}
import graft.streaming.EventStreams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spline, RDP, weighted quantile, sessionization queries
  * (SURVEY.md §2 #18, #32, #33, #52). */
object MiscQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // #18 weighted quantile (integral weights → exact cross-engine
    // threshold comparison).
    "q_weighted_quantile" -> ((s, dir) =>
      Stats.weightedQuantile(Tables.lineitem(s, dir), "l_extendedprice", "l_quantity",
        Seq(0.25, 0.5, 0.75)).orderBy("q")),

    // #32 natural cubic spline through per-user hourly averages,
    // evaluated at half-hour offsets (rows-only).
    "q_spline" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .withColumn("hour", (col("eps_us") / 3.6e9).cast("double"))
      val knots = e.groupBy(col("user_id"), floor(col("hour")).as("hx"))
        .agg(avg("value").as("hy"))
      // probes are knots+0.5 → fused path: one agg + flatMap, no join
      Spline.interpolateAtOffsets(knots, "user_id", "hx", "hy", 0.5)
        .select(col("user_id"), col("px"), round(col("y"), 4).as("y"))
        .orderBy("user_id", "px")
    }),

    // #33 RDP polyline simplification per user (rows-only).
    "q_rdp" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .withColumn("eps", col("eps_us").cast("double") / 1000000.0)
      Simplify.rdp(e, "user_id", "eps", "value", epsilon = 50.0)
        .select(col("user_id"), round(col("eps"), 6).as("eps"), col("value"))
        .orderBy("user_id", "eps")
    }),

    // #52 gap sessionization (batch flavor of the streaming op).
    "q_sessionize" -> ((s, dir) =>
      EventStreams.sessionize(Tables.events(s, dir), gapMs = 600000L)
        .select(col("user_id"), col("session_start_us"), col("session_end_us"),
          col("n_events"), round(col("sum_value"), 2).as("sum_value"))
        .orderBy("user_id", "session_start_us")),

    // #52 windowed aggregation (batch flavor of the streaming op —
    // same transform runs on readStream with a watermark).
    "q_windowed_agg" -> ((s, dir) =>
      EventStreams.windowedAgg(Tables.events(s, dir), "10 minutes", "30 minutes")
        .select(unix_micros(col("win_start")).as("win_start_us"), col("event_type"),
          col("cnt"), round(col("sum_value"), 2).as("sum_value"))
        .orderBy("win_start_us", "event_type")),
  )

  val oracle: Map[String, String] = Map(
    "q_weighted_quantile" ->
      """WITH c AS (SELECT l_extendedprice AS v, l_quantity AS w FROM lineitem WHERE l_quantity > 0),
        |cum AS (SELECT v, sum(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cw,
        |        sum(w) OVER () AS tw FROM c)
        |SELECT q, value FROM (
        | SELECT cast(0.25 as double) AS q, round(min(v),4) AS value FROM cum WHERE cw >= 0.25*tw
        | UNION ALL SELECT 0.5, round(min(v),4) FROM cum WHERE cw >= 0.5*tw
        | UNION ALL SELECT 0.75, round(min(v),4) FROM cum WHERE cw >= 0.75*tw
        |) ORDER BY q""".stripMargin,

    "q_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS eps_us, value FROM events),
        |m AS (SELECT user_id, eps_us, value,
        |  CASE WHEN eps_us - lag(eps_us) OVER (PARTITION BY user_id ORDER BY eps_us) > 600000000
        |       THEN 1 ELSE 0 END AS brk FROM e),
        |s AS (SELECT user_id, eps_us, value,
        |  sum(brk) OVER (PARTITION BY user_id ORDER BY eps_us ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        |SELECT user_id, min(eps_us) AS session_start_us, max(eps_us) AS session_end_us,
        | cast(count(*) as int) AS n_events, round(sum(value),2) AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin,

    "q_windowed_agg" ->
      """SELECT (epoch_us(ts)//600000000)*600000000 AS win_start_us, event_type,
        | count(*) AS cnt, round(sum(value),2) AS sum_value
        |FROM events GROUP BY 1, 2
        |ORDER BY win_start_us, event_type""".stripMargin,
  )
}
