package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed and interpolated lookup — the reference's secondary-index ops
  * (/root/reference/private/df.rkt: df-equal-range l.463, df-lookup
  * l.474, df-lookup/interpolated l.514) re-expressed as
  * joins so they distribute.
  *
  * Scale notes:
  *  - `lookup` broadcasts the (small) probe side — a keyed point lookup
  *    over 100 TB is a broadcast-hash-join against the fact table, never
  *    a driver-side binary search.
  *  - `interpolated` builds value *segments* [ts, next_ts) per key with
  *    one window pass (distributed by key), then range-joins the probes.
  *    With a small probe set Spark picks broadcast-nested-loop on the
  *    probe side; with a large one, both sides can be range-bucketed
  *    first (bucket = floor(ts / step)) to make it an equi-join.
  */
object Lookup {

  /** df-lookup: for each probe key, fetch value columns from `base`.
    * Equivalent to index lookup; broadcast when probes are small. */
  def lookup(base: DataFrame, probes: DataFrame, key: String, valueCols: Seq[String]): DataFrame =
    base.select(key, valueCols: _*).join(broadcast(probes), Seq(key), "inner")

  /** df-lookup/interpolated: linear interpolation of `valueCol` at each
    * probe timestamp, per `keyCol` series, between bracketing samples.
    *
    * `tsCol` must be a numeric (epoch) column. Probes: (keyCol, probe
    * numeric ts). Rows whose probe falls outside the series range are
    * dropped (reference clamps; callers can pre-clamp).
    */
  def interpolated(base: DataFrame, probes: DataFrame, keyCol: String,
                   tsCol: String, valueCol: String, probeCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol))
    val segments = base
      .select(col(keyCol), col(tsCol), col(valueCol))
      .withColumn("__t1", lead(col(tsCol), 1).over(w))
      .withColumn("__v1", lead(col(valueCol), 1).over(w))
      // the final segment is closed on the right so a probe exactly at
      // the series' last sample returns that boundary value (reference
      // behavior) instead of silently dropping
      .withColumn("__last", lead(col(tsCol), 2).over(w).isNull)
      .filter(col("__t1").isNotNull)
    val p = broadcast(probes)
    segments.join(p,
        p(keyCol) === segments(keyCol) &&
        p(probeCol) >= col(tsCol) &&
        (p(probeCol) < col("__t1") || (col("__last") && p(probeCol) === col("__t1"))))
      .select(segments(keyCol).as(keyCol), p(probeCol).as(probeCol),
        (col(valueCol) + (col("__v1") - col(valueCol)) *
          (p(probeCol) - col(tsCol)) / (col("__t1") - col(tsCol))).as("interp"))
  }

  /** time-delay-series (reference private/scatter.rkt l.35): for each sample,
    * the value of the series at the first sample >= ts + delay, per key.
    * Two hash-shuffles on the key — no global sort. */
  def timeDelay(base: DataFrame, keyCol: String, tsCol: String, valueCol: String,
                idCol: String, delay: Column): DataFrame = {
    val e1 = base.select(col(keyCol), col(tsCol).as("__t0"), col(idCol))
    val e2 = base.select(col(keyCol).as("__k2"), col(tsCol).as("__t2"),
      col(valueCol).as("__v2"), col(idCol).as("__id2"))
    // min_by picks the earliest matching sample; tie-break on id for determinism.
    e1.join(e2, e1(keyCol) === col("__k2") && col("__t2") >= col("__t0") + delay)
      .groupBy(col(keyCol), col(idCol))
      .agg(min_by(struct(col("__v2"), col("__id2")), struct(col("__t2"), col("__id2"))).as("m"))
      .select(col(keyCol), col(idCol), col("m.__v2").as("delayed_value"))
  }
}
