package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Histogram — mirrors /root/reference/private/histogram.rkt
  * (samples->buckets l.37, df-histogram l.180).
  *
  * Reference semantics: bucket = trunc(v / bucket-width) (truncate
  * toward zero — bucket value is the interval start), rank = count or
  * Δweight, optional drop of zero-bucket, dense bucket range between
  * min and max bucket (empty buckets present with rank 0), optional
  * as-percentage.
  *
  * Spark shape: one hash aggregation (map-side partial) for the sparse
  * buckets, then a tiny dense-range expansion via `sequence` + a
  * broadcast join — the dense fill is proportional to the bucket range,
  * not the data size, so it scales.
  */
object Histogram {

  private def bucketOf(v: Column, width: Double): Column =
    (v / lit(width)).cast("long") // cast truncates toward zero = reference exact-truncate

  /** Unweighted histogram with dense bucket range. Output:
    * (bucket_start double, rank). */
  def histogram(df: DataFrame, valueCol: String, width: Double,
                includeZeroes: Boolean = true, asPercentage: Boolean = false): DataFrame = {
    val base = df.filter(col(valueCol).isNotNull)
      .select(bucketOf(col(valueCol), width).as("__b"))
    val filtered = if (includeZeroes) base else base.filter(col("__b") =!= 0)
    val sparse = filtered.groupBy(col("__b")).agg(count(lit(1)).cast("double").as("__r"))
    densify(sparse, width, asPercentage)
  }

  /** Weighted histogram: consecutive-pair fold per the reference —
    * value = (v_prev+v)/2, rank contribution = Δweight. Pairs come from
    * Stats.weightedPairs (same single window pass). */
  def weightedHistogram(pairs: DataFrame, width: Double,
                        includeZeroes: Boolean = true, asPercentage: Boolean = false): DataFrame = {
    val base = pairs.select(bucketOf(col("__wx"), width).as("__b"), col("__ww"))
    val filtered = if (includeZeroes) base else base.filter(col("__b") =!= 0)
    val sparse = filtered.groupBy(col("__b")).agg(sum(col("__ww")).as("__r"))
    densify(sparse, width, asPercentage)
  }

  private def densify(sparse: DataFrame, width: Double, asPercentage: Boolean): DataFrame = {
    val spark = sparse.sparkSession
    // The bucket range is tiny (bounded by value range / width), so the
    // dense axis is a broadcast side; `sequence` builds it distributed-free.
    val bounds = sparse.agg(min("__b").as("lo"), max("__b").as("hi"), sum("__r").as("total"))
    val dense = bounds.select(explode(sequence(col("lo"), col("hi"))).as("__b"), col("total"))
    val joined = dense.join(sparse, Seq("__b"), "left")
      .withColumn("__r", coalesce(col("__r"), lit(0.0)))
    val ranked = if (asPercentage)
      joined.withColumn("__r", when(col("total") > 0, col("__r") * 100.0 / col("total")).otherwise(0.0))
    else joined
    ranked.select((col("__b") * width).cast("double").as("bucket_start"),
      round(col("__r"), 4).as("rank"))
  }

  /** Categorical histogram — the reference's df-histogram on a string
    * series (bucket key = the value itself, bucket-width 1 path in
    * histogram.rkt samples->buckets). */
  def categorical(df: DataFrame, valueCol: String, asPercentage: Boolean = false): DataFrame = {
    val sparse = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("bucket")).agg(count(lit(1)).cast("double").as("__r"))
    if (!asPercentage) sparse.select(col("bucket"), col("__r").as("rank"))
    else {
      val totalRow = sparse.agg(sum("__r")).first()
      if (totalRow.isNullAt(0) || totalRow.getDouble(0) == 0)
        sparse.select(col("bucket"), col("__r").as("rank")) // empty input → empty frame
      else {
        val total = totalRow.getDouble(0)
        sparse.select(col("bucket"), round(col("__r") * 100.0 / total, 4).as("rank"))
      }
    }
  }

  /** trim-histogram-outliers: drop leading/trailing buckets whose rank is
    * below `percent` of total, stopping at the first kept bucket on each
    * side (reference semantics). Histogram results are tiny — computed
    * on the collected table. */
  def trimOutliers(hist: Array[(Double, Double)], percent: Double): Array[(Double, Double)] = {
    val total = hist.map(_._2).sum
    if (total <= 0) return hist
    val thr = percent * total
    val first = hist.indexWhere(_._2 >= thr)
    val last = hist.lastIndexWhere(_._2 >= thr)
    if (first < 0) Array.empty else hist.slice(first, last + 1)
  }

  /** combine-histograms: align two histograms on bucket_start. */
  def combine(h1: DataFrame, h2: DataFrame): DataFrame =
    h1.withColumnRenamed("rank", "rank1")
      .join(h2.withColumnRenamed("rank", "rank2"), Seq("bucket_start"), "outer")
      .na.fill(0.0, Seq("rank1", "rank2"))
}
