package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mean-max ("best average") — mirrors /root/reference/private/meanmax.rkt
  * (make-delta-series l.144, get-mean-max l.156, df-mean-max l.262): for each duration d, the maximum over the series of
  * the average of the value over a trailing time window of length d.
  * (The reference walks a delta series accumulating elapsed time until
  * the window covers >= d; the declarative equivalent is a RANGE-frame
  * moving average keyed on elapsed/epoch time.)
  *
  * Scale shape: ONE shuffle+sort per key (all durations share the same
  * window partitioning/ordering — Spark plans them over a single sort),
  * then a tiny global max per duration. Per-key windows distribute; the
  * reference's single-activity case is just one key.
  */
object MeanMax {

  /** Output: (duration long, best_avg double) — max over all keys/positions
    * of the trailing range-window average. */
  def meanMax(df: DataFrame, keyCol: String, epochCol: String, valueCol: String,
              durations: Seq[Long]): DataFrame = {
    val cols = durations.map { d =>
      val w = Window.partitionBy(keyCol).orderBy(col(epochCol).cast("long"))
        .rangeBetween(-d, 0)
      avg(col(valueCol)).over(w).as(s"__mm_$d")
    }
    val withAvgs = df.select(col(keyCol) +: col(epochCol) +: cols: _*)
    val maxes = withAvgs.agg(
      max(col(s"__mm_${durations.head}")).as(s"__mm_${durations.head}"),
      durations.tail.map(d => max(col(s"__mm_$d")).as(s"__mm_$d")): _*)
    val stacked = durations.map(d => s"${d}L, round(`__mm_$d`, 4)").mkString(", ")
    maxes.selectExpr(s"stack(${durations.size}, $stacked) as (duration, best_avg)")
  }

  /** df-mean-max/lap-swim preprocessing (reference meanmax.rkt l.291):
    * lap-swim frames record one sample per length with NAs at pauses —
    * duplicate each sample at the previous sample's time (start+end of
    * the length) and coalesce NAs to 0 so window averages weight
    * lengths correctly. Returns the expanded (key, eps, value) frame to
    * feed `meanMax`. */
  def lapSwimPrep(df: DataFrame, keyCol: String, epochCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(epochCol))
    val base = df.select(col(keyCol), col(epochCol).cast("long").as(epochCol),
      coalesce(col(valueCol), lit(0.0)).as(valueCol))
      .withColumn("__prev_eps", lag(col(epochCol), 1).over(w))
    val starts = base.filter(col("__prev_eps").isNotNull)
      .select(col(keyCol), col("__prev_eps").as(epochCol), col(valueCol))
    base.select(col(keyCol), col(epochCol), col(valueCol)).union(starts)
  }

  /** df-mean-max-aux (reference meanmax.rkt l.310): for
    * each duration, the AUX series' average over the window where the
    * MAIN series attains its best average. Same single window
    * sort/shuffle; argmax via max_by over (main_avg ordering). */
  def meanMaxAux(df: DataFrame, keyCol: String, epochCol: String, valueCol: String,
                 auxCol: String, durations: Seq[Long]): DataFrame = {
    val pairs = durations.map { d =>
      val w = Window.partitionBy(keyCol).orderBy(col(epochCol).cast("long"))
        .rangeBetween(-d, 0)
      (avg(col(valueCol)).over(w).as(s"__m_$d"), avg(col(auxCol)).over(w).as(s"__a_$d"))
    }
    val withAvgs = df.select(
      col(keyCol) +: col(epochCol).cast("long").as("__eps") +:
        pairs.flatMap(p => Seq(p._1, p._2)): _*)
    val aggs = durations.map(d =>
      max_by(struct(col(s"__m_$d"), col(s"__a_$d")),
        struct(col(s"__m_$d"), col("__eps"), col(keyCol))).as(s"__b_$d"))
    val best = withAvgs.agg(aggs.head, aggs.tail: _*)
    val stacked = durations.map(d =>
      s"${d}L, round(`__b_$d`.`__m_$d`, 4), round(`__b_$d`.`__a_$d`, 4)").mkString(", ")
    best.selectExpr(s"stack(${durations.size}, $stacked) as (duration, best_avg, aux_avg)")
  }
}
