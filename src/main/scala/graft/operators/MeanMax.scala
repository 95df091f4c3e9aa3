package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mean-max ("best average") — mirrors /root/reference/private/meanmax.rkt
  * `df-mean-max`: for each duration d, the maximum over the series of
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
}
