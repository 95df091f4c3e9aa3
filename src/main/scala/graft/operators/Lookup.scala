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

  /** df-lookup/interpolated at scale: when the probe set grows with the
    * data (a per-key grid, a second series), broadcasting it stops
    * being an option — this variant co-partitions BOTH sides by key and
    * runs a per-partition two-pointer merge (the AsOf pattern):
    * O(n + m) per key, no broadcast, no range join. Float operation
    * order matches `interpolated` (linear interpolation, final segment
    * closed on the right); a segment with a null endpoint value yields
    * a null interp like the join formulation.
    *
    * Preconditions/divergences vs `interpolated`: keyCol must cast to
    * long (null/uncastable keys are dropped); rows with a null
    * timestamp are dropped; zero-width final segments (duplicate last
    * timestamp) produce no row instead of a NaN row. Task memory is
    * bounded by ONE key's samples — the same bound a keyed window
    * holds, without its spill path; keys beyond that size need the
    * range-bucketed join instead.
    *
    * `carryCols`: extra probe columns passed through to the output
    * unchanged. Without this, a caller that needs probe context (a grid
    * index, a label) has to re-join the probe frame on (key, probe) —
    * a second probe computation plus a shuffle join the merge already
    * paid for. */
  def interpolatedMerge(base: DataFrame, probes: DataFrame, keyCol: String,
      tsCol: String, valueCol: String, probeCol: String,
      carryCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    import scala.collection.mutable.ArrayBuffer
    val spark = base.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val b = base
      .select(col(keyCol).cast("long"), col(tsCol).cast("double"), col(valueCol).cast("double"))
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull) // post-cast: uncastable keys are null
      .repartition(n, col(keyCol)).sortWithinPartitions(keyCol, tsCol)
    val p = probes.select(col(keyCol).cast("long") +: col(probeCol).cast("double") +:
        carryCols.map(probes(_)): _*)
      .filter(col(keyCol).isNotNull && col(probeCol).isNotNull)
      .repartition(n, col(keyCol)).sortWithinPartitions(keyCol, probeCol)
    val carrySchema = carryCols.map(c => p.schema(c))
    val out = p.rdd.zipPartitions(b.rdd) { (pi, bi) =>
      val bBuf = bi.buffered
      var curKey = Long.MinValue
      var open = false
      var ts: Array[Double] = null
      var vs: Array[java.lang.Double] = null
      var ptr = 0
      pi.flatMap { prow =>
        val k = prow.getLong(0)
        val pv = prow.getDouble(1)
        if (!open || k != curKey) {
          while (bBuf.hasNext && bBuf.head.getLong(0) < k) bBuf.next()
          val tb = ArrayBuffer.empty[Double]
          val vb = ArrayBuffer.empty[java.lang.Double]
          while (bBuf.hasNext && bBuf.head.getLong(0) == k) {
            val r = bBuf.next()
            tb += r.getDouble(1)
            vb += (if (r.isNullAt(2)) null else Double.box(r.getDouble(2)))
          }
          ts = tb.toArray; vs = vb.toArray; curKey = k; open = true; ptr = 0
        }
        if (ts.length < 2) Iterator.empty
        else {
          // probes ascend within the key, so the segment pointer only
          // moves forward: advance while the next sample is <= probe
          while (ptr < ts.length - 2 && ts(ptr + 1) <= pv) ptr += 1
          val t0 = ts(ptr); val t1 = ts(ptr + 1)
          val isLast = ptr == ts.length - 2
          if (t1 > t0 && pv >= t0 && (pv < t1 || (isLast && pv == t1))) {
            val v0 = vs(ptr); val v1 = vs(ptr + 1)
            val interp: java.lang.Double =
              if (v0 == null || v1 == null) null
              else Double.box(v0 + (v1 - v0) * (pv - t0) / (t1 - t0))
            Iterator.single(Row.fromSeq(k +: pv +: interp +:
              (2 until prow.length).map(prow.get)))
          } else Iterator.empty
        }
      }
    }
    spark.createDataFrame(out, StructType(
      StructField(keyCol, LongType, nullable = false) +:
      StructField(probeCol, DoubleType, nullable = false) +:
      StructField("interp", DoubleType, nullable = true) +:
      carrySchema))
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
