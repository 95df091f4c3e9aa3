package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistics — mirrors /root/reference/private/statistics.rkt
  * (weighted-statistics l.43, df-statistics l.64, df-quantile l.84).
  *
  * `df-statistics` without a weight series is a plain aggregation.
  * With a weight series the reference folds consecutive sample pairs:
  * value = (v_prev + v) / 2, weight = w - w_prev (Δ of the weight
  * series, e.g. elapsed time), skipping pairs with Δw <= 0 or NA — the
  * standard treatment for irregularly-sampled telemetry. We reproduce
  * that with one window pass (distributed by key when given) + one
  * aggregation.
  *
  * Weighted moments are population-style: μ = Σw·x/Σw,
  * σ² = Σw·x²/Σw − μ² (reference uses math/statistics with default
  * bias #f).
  */
object Stats {

  /** df-statistics (unweighted): count/mean/stddev(sample)/min/max. */
  def statistics(df: DataFrame, valueCol: String): DataFrame =
    df.agg(
      count(col(valueCol)).as("cnt"),
      round(avg(col(valueCol)), 4).as("mean"),
      round(stddev_samp(col(valueCol)), 4).as("stddev"),
      round(min(col(valueCol)), 4).as("min"),
      round(max(col(valueCol)), 4).as("max"))

  /** Full moments like the reference's statistics struct (adds sample
    * skewness and excess kurtosis). Separate from `statistics` so the
    * oracle-pinned schema stays stable. */
  def statisticsFull(df: DataFrame, valueCol: String): DataFrame =
    df.agg(
      count(col(valueCol)).as("cnt"),
      round(avg(col(valueCol)), 4).as("mean"),
      round(stddev_samp(col(valueCol)), 4).as("stddev"),
      round(min(col(valueCol)), 4).as("min"),
      round(max(col(valueCol)), 4).as("max"),
      round(skewness(col(valueCol)), 4).as("skewness"),
      round(kurtosis(col(valueCol)), 4).as("kurtosis"))

  /** Midpoint/Δweight pairs per the reference's weighted-statistics fold.
    * Returns rows with (__wx = midpoint value, __ww = Δweight), Δw>0
    * only. Keyed: one window pass distributed by key. Unkeyed (the
    * reference's single-series case): a global window would put ALL
    * rows in one task, so instead range-partition on the order columns,
    * sort within partitions, and exchange one boundary row per
    * partition — global-order lag without a global window. */
  def weightedPairs(df: DataFrame, keyCol: Option[String], orderCols: Seq[Column],
                    valueCol: String, weightCol: String): DataFrame = keyCol match {
    case Some(k) =>
      val w = Window.partitionBy(k).orderBy(orderCols: _*)
      df.withColumn("__pv", lag(col(valueCol), 1).over(w))
        .withColumn("__pw", lag(col(weightCol), 1).over(w))
        // both endpoint values must be non-NA — a null current value would
        // still add its Δw to the total weight and bias the mean
        .filter(col("__pv").isNotNull && col(valueCol).isNotNull &&
          (col(weightCol) > col("__pw")))
        .withColumn("__wx", (col("__pv") + col(valueCol)) / 2)
        .withColumn("__ww", col(weightCol) - col("__pw"))
    case None => globalWeightedPairs(df, orderCols, valueCol, weightCol)
  }

  /** Global-order consecutive pairs with no global window: the
    * GlobalOrder boundary-exchange (parallel range sort + one seed row
    * per partition), then the same midpoint/Δweight arithmetic as the
    * keyed path — in Catalyst, so it stays codegen'd. */
  private def globalWeightedPairs(df: DataFrame, orderCols: Seq[Column],
      valueCol: String, weightCol: String): DataFrame = {
    val named = orderCols.zipWithIndex.map { case (c, i) => c.as(s"__o$i") }
    val base = df.select(named :+ col(valueCol).cast("double").as("__v")
      :+ col(weightCol).cast("double").as("__w"): _*)
    GlobalOrder.withPrev(base, named.indices.map(i => col(s"__o$i")), Seq("__v", "__w"))
      .filter(col("__prev___v").isNotNull && col("__v").isNotNull &&
        (col("__w") > col("__prev___w")))
      .select(((col("__prev___v") + col("__v")) / 2).as("__wx"),
        (col("__w") - col("__prev___w")).as("__ww"))
  }

  /** df-statistics with a weight series: weighted mean + population
    * stddev over the midpoint/Δweight pairs. */
  def weightedStatistics(df: DataFrame, keyCol: Option[String], orderCols: Seq[Column],
                         valueCol: String, weightCol: String): DataFrame = {
    val pairs = weightedPairs(df, keyCol, orderCols, valueCol, weightCol)
    pairs.agg(
        (sum(col("__wx") * col("__ww")) / sum(col("__ww"))).as("__m"),
        (sum(col("__wx") * col("__wx") * col("__ww")) / sum(col("__ww"))).as("__m2"),
        sum(col("__ww")).as("__tw"),
        count(lit(1)).as("cnt"))
      .select(
        col("cnt"),
        round(col("__m"), 4).as("wmean"),
        round(sqrt(col("__m2") - col("__m") * col("__m")), 4).as("wstddev"),
        round(col("__tw"), 4).as("total_weight"))
  }

  /** df-quantile (unweighted, exact): linear-interpolated quantiles,
    * identical to DuckDB quantile_cont. Exact percentile is a
    * sort-based aggregate — fine for a single series; at 100 TB use
    * `approxQuantile`/percentile_approx (also provided). */
  def quantiles(df: DataFrame, valueCol: String, qs: Seq[Double]): DataFrame = {
    val arr = s"array(${qs.map(q => s"${q}D").mkString(",")})"
    df.agg(expr(s"percentile($valueCol, $arr)").as("__p"))
      .select(posexplode(col("__p")).as(Seq("__i", "value")))
      .select(expr(s"$arr[__i]").as("q"), round(col("value"), 4).as("value"))
  }

  /** Approximate quantiles for the 100 TB path (single pass, mergeable
    * sketch). */
  def quantilesApprox(df: DataFrame, valueCol: String, qs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val arr = s"array(${qs.map(q => s"${q}D").mkString(",")})"
    df.agg(expr(s"approx_percentile($valueCol, $arr, $accuracy)").as("__p"))
      .select(posexplode(col("__p")).as(Seq("__i", "value")))
      .select(expr(s"$arr[__i]").as("q"), col("value"))
  }

  /** [[quantilesApprox]] with a PER-RUN bound check: for each q it
    * emits the exact admissible value window
    * [percentile_disc(q − 2ε), percentile_disc(q + 2ε)] (ε =
    * 1/accuracy) and `within` = the sketch's cut point lies inside it.
    * The sketch guarantees rank(cut) ∈ [⌊(q−ε)n⌋, ⌈(q+ε)n⌉]; the
    * window's discrete ranks ⌈(q∓2ε)n⌉ bracket that interval whenever
    * ε·n ≥ 2 (n ≥ 2·accuracy rows — the discretization slack), so a
    * correct sketch always lands within. The window endpoints are
    * EXACT data elements (SQL-standard percentile_disc = value at rank
    * ⌈p·n⌉), independently computable by another engine — which turns
    * the sketch's spec-only guarantee into a cross-engine per-run data
    * check: the oracle recomputes (q, lo, hi) and asserts within=true.
    *
    * RANK-BOUNDARY STABILITY (r15): probing percentile_disc at the
    * raw probability p is FP-fragile exactly when p·n is an integer —
    * both engines compute rank = ⌈p·n⌉ in double, and at sf1
    * (n = 6,000,000) 0.0102·n reads 61200.00000000001, so Spark
    * ceiled to 61201 while DuckDB landed on 61200 and the two engines
    * returned ADJACENT data elements (the first sf1 gate failure this
    * query ever produced; smaller SFs masked it behind duplicate
    * values). The fix makes the rank explicit: count n first (one
    * extra job — this is the verification path, not the production
    * path), compute k = ⌈p·n⌉ in EXACT BigDecimal arithmetic, then
    * probe at the mid-interval probability (k − 1/2)/n, which double
    * rounding cannot move off k on any engine (the oracle SQL mirrors
    * the same ceil-of-DECIMAL-times-count arithmetic). Exact
    * percentile_disc is a sort-based aggregate — this is a
    * VERIFICATION query; the production path at scale is
    * [[quantilesApprox]] alone.
    *
    * PRECONDITION GUARD: the bracket argument needs ε·n ≥ 2 (n ≥
    * 2·accuracy non-null rows) — below that a CORRECT sketch can
    * legitimately land outside the window. The row count piggybacks on
    * the same aggregation; when the precondition is unmet `within`
    * comes back NULL (never a spurious true/false), which an oracle
    * expecting `true` flags loudly as a mismatch pointing here.
    *
    * STABLE-INPUT REQUIREMENT: n is counted in a separate job BEFORE
    * the main aggregate, so `df` must read the same snapshot in both
    * jobs (deterministic source, no concurrent append). Over a source
    * that can change between jobs, the disc probes would target ranks
    * from a stale n while the `within` guard reads the in-aggregate
    * __n — persist/cache the input around the call in that case. All
    * project inputs are immutable parquet snapshots, so the extra
    * cache is not paid here. */
  def quantilesApproxChecked(df: DataFrame, valueCol: String, qs: Seq[Double],
                             accuracy: Int = 10000): DataFrame = {
    val margin = BigDecimal(2) / BigDecimal(accuracy)
    val probes = qs.map { q =>
      val bq = BigDecimal(q.toString)
      (bq.toString, bq - margin, bq + margin)
    }
    probes.foreach { case (_, lo, hi) =>
      require(lo > 0 && hi < 1,
        s"q ± 2/accuracy must stay inside (0,1), got ($lo, $hi)") }
    // count first so the disc probes can target explicit ranks (see
    // Scaladoc: FP-stable mid-interval probabilities need n up front)
    val n = df.agg(count(col(valueCol))).first().getLong(0)
    def midProb(p: BigDecimal): String =
      if (n == 0) p.toString // degenerate: percentile_disc returns null anyway
      else {
        val k = (p * n).setScale(0, BigDecimal.RoundingMode.CEILING)
        ((k - BigDecimal("0.5")) / n).toString // (k − ½)/n; DECIMAL128 division
      }
    val arr = s"array(${qs.map(q => s"${q}D").mkString(",")})"
    val aggs =
      expr(s"approx_percentile($valueCol, $arr, $accuracy)").as("__av") +:
      count(col(valueCol)).as("__n") +:
      probes.zipWithIndex.flatMap { case ((_, lo, hi), i) => Seq(
        expr(s"percentile_disc(${midProb(lo)}D) WITHIN GROUP (ORDER BY $valueCol)").as(s"__lo$i"),
        expr(s"percentile_disc(${midProb(hi)}D) WITHIN GROUP (ORDER BY $valueCol)").as(s"__hi$i")) }
    val agg = df.agg(aggs.head, aggs.tail: _*)
    val rows = probes.zipWithIndex.map { case ((q, _, _), i) =>
      struct(expr(s"${q}D").as("q"), col(s"__lo$i").as("lo"), col(s"__hi$i").as("hi"),
        when(col("__n") < 2L * accuracy, lit(null).cast("boolean"))
          .otherwise(
            element_at(col("__av"), i + 1) >= col(s"__lo$i") &&
            element_at(col("__av"), i + 1) <= col(s"__hi$i")).as("within"))
    }
    agg.select(explode(array(rows: _*)).as("__r")).select(col("__r.*"))
  }

  /** Weighted quantile: first value whose cumulative weight (in value
    * order) reaches q·total — the reference's lower weighted quantile.
    *
    * Distributed two-pass: range-partition + sort by value (Spark's
    * parallel sort), collect only the per-partition weight SUMS to the
    * driver (#partitions numbers), turn them into prefix offsets, then
    * scan just the partitions containing a crossing. No global window,
    * no single-task cumsum — holds at 100 TB. */
  def weightedQuantile(df: DataFrame, valueCol: String, weightCol: String,
                       qs: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    val parts = df.select(col(valueCol).cast("double").as("v"), col(weightCol).cast("double").as("w"))
      .filter(col("w") > 0)
      .repartitionByRange(spark.sessionState.conf.numShufflePartitions, col("v"))
      .sortWithinPartitions("v")
    parts.persist()
    try {
      val partSums = parts.groupBy(spark_partition_id().as("pid")).agg(sum("w").as("s"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val nParts = parts.rdd.getNumPartitions
      val prefix = new Array[Double](nParts + 1)
      for (p <- 0 until nParts) prefix(p + 1) = prefix(p) + partSums.getOrElse(p, 0.0)
      val total = prefix(nParts)
      // (q, in-partition residual target) per partition that crosses
      val targets = qs.map { q =>
        val t = q * total
        val pid =
          if (t <= 0) (0 until nParts).find(p => partSums.getOrElse(p, 0.0) > 0).getOrElse(0)
          else (0 until nParts).find(p => prefix(p) < t && t <= prefix(p + 1)).getOrElse(nParts - 1)
        (q, pid, math.max(t - prefix(pid), 0.0))
      }
      val byPid = targets.groupBy(_._2)
      val bc = spark.sparkContext.broadcast(byPid)
      val hits = parts.rdd.mapPartitionsWithIndex { (pid, it) =>
        bc.value.get(pid) match {
          case None => Iterator.empty
          case Some(ts) =>
            val remaining = scala.collection.mutable.Buffer(ts.sortBy(_._3): _*)
            val out = List.newBuilder[(Double, Double)]
            var cum = 0.0
            while (remaining.nonEmpty && it.hasNext) {
              val r = it.next()
              cum += r.getDouble(1)
              while (remaining.nonEmpty && cum >= remaining.head._3) {
                out += ((remaining.head._1, r.getDouble(0)))
                remaining.remove(0)
              }
            }
            out.result().iterator
        }
      }.collect().toMap
      import spark.implicits._
      qs.map(q => (q, hits.get(q)
          .map(v => BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
          .getOrElse(Double.NaN)))
        .toDF("q", "value")
    } finally parts.unpersist()
  }
}
