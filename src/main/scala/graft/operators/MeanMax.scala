package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Mean-max ("best average") — faithful to /root/reference/private/meanmax.rkt:
  * `make-delta-series` (l.144) turns consecutive samples into trapezoid
  * slices (dt, dt·(y1+y2)/2, x1); `get-mean-max` (l.156) slides a window
  * of EXACTLY `duration` along the slice list, prorating the final
  * partial slice linearly in time, and only emits windows the data
  * fully covers; the best is max total/duration (min when `inverted` —
  * l.158, used for pace/ground-contact-style series).
  *
  * Equivalent formulation used here: with C(x) the piecewise-linear
  * cumulative trapezoid integral anchored at the first sample, a window
  * starting at sample position p has total C(p + d) − C(p); it exists
  * iff p + d ≤ last-sample-x. Per key this is prefix sums plus a
  * monotone tail pointer — O(samples · durations), one pass.
  *
  * Scale shape: hash-partition by key + in-partition sort, then one
  * per-key partition-local pass computing every duration simultaneously
  * (memory = one key's samples, the same bound a window operator has).
  * No unpartitioned window, no per-duration re-shuffle; the global
  * reduce ranks |keys|·|durations| rows.
  */
object MeanMax {

  /** important-mean-max-durations (meanmax.rkt l.37), seconds. */
  val importantDurations: Seq[Long] = Seq(10L, 15L, 30L, 45L, 60L, 75L, 90L,
    120L, 180L, 300L, 600L, 900L, 1200L, 1800L, 2700L, 3600L, 5400L, 7200L, 10800L)

  /** generate-mean-max-durations (meanmax.rkt l.48): growth-spaced
    * duration sample points (min growth +5 → +20, capped at maxGrowth). */
  def generatedDurations(start: Long = 10L, limit: Long = 18000L,
                         growth: Double = 1.2, maxGrowth: Long = 300L): Seq[Long] = {
    val out = ArrayBuffer(start)
    var cur = start
    var done = false
    while (!done) {
      var next = math.round(cur * growth)
      if (next < cur + 5) next = cur + 20
      if (next > cur + maxGrowth) next = cur + maxGrowth
      if (next < limit) { out += next; cur = next } else done = true
    }
    out.toSeq
  }

  /** default-mean-max-durations (meanmax.rkt l.62): sorted merge of the
    * generated fill points with the important durations. */
  def defaultDurations: Seq[Long] =
    (generatedDurations() ++ importantDurations).distinct.sorted

  private val bestsSchema = StructType(Seq(
    StructField("__k", LongType, nullable = false),
    StructField("duration", LongType, nullable = false),
    StructField("__total", DoubleType, nullable = false),
    StructField("__pos", LongType, nullable = false),
    StructField("__atotal", DoubleType, nullable = true),
    StructField("__atime", DoubleType, nullable = true)))

  /** Per-key best window totals for every duration. Rows with NA
    * epoch/value are dropped (reference df-mean-max filter-fn, l.266);
    * keys with fewer than 2 samples produce nothing (make-mean-max,
    * l.193). `epochCol` must be numeric and `keyCol` castable to long
    * (hash string keys through xxhash64 first); rows whose key casts to
    * null are dropped like NA samples. */
  private def perKeyBests(df: DataFrame, keyCol: String, epochCol: String,
      valueCol: String, auxCol: Option[String], durations: Seq[Long],
      inverted: Boolean): DataFrame = {
    val spark = df.sparkSession
    val nPart = spark.sessionState.conf.numShufflePartitions
    val cols = Seq(col(keyCol).cast("long").as("__k"),
      col(epochCol).cast("long").as("__x"), col(valueCol).cast("double").as("__y")) ++
      auxCol.map(a => col(a).cast("double").as("__a"))
    val base = df.select(cols: _*)
      .filter(col("__k").isNotNull && col("__x").isNotNull && col("__y").isNotNull)
      .repartition(nPart, col("__k")).sortWithinPartitions("__k", "__x")
    val durs = durations.toArray.sorted
    val hasAux = auxCol.isDefined
    val inv = inverted
    val rdd = base.rdd.mapPartitions { it =>
      val acc = ArrayBuffer.empty[Row]
      val xs = ArrayBuffer.empty[Long]
      val ys = ArrayBuffer.empty[Double]
      val as = ArrayBuffer.empty[java.lang.Double]
      var curKey = 0L
      var open = false
      def flush(): Unit = {
        if (open && xs.length >= 2) acc ++= keyBests(curKey, xs, ys, as, durs, hasAux, inv)
        xs.clear(); ys.clear(); as.clear()
      }
      while (it.hasNext) {
        val r = it.next()
        val k = r.getLong(0)
        if (!open || k != curKey) { flush(); curKey = k; open = true }
        xs += r.getLong(1); ys += r.getDouble(2)
        if (hasAux) as += (if (r.isNullAt(3)) null else Double.box(r.getDouble(3)))
      }
      flush()
      acc.iterator
    }
    spark.createDataFrame(rdd, bestsSchema)
  }

  /** get-mean-max (meanmax.rkt l.156) over one key's sorted samples, all
    * durations in one pass. The first strictly-better window wins
    * (reference maybe-update uses strict compare → earliest position). */
  private def keyBests(key: Long, xs: ArrayBuffer[Long], ys: ArrayBuffer[Double],
      as: ArrayBuffer[java.lang.Double], durs: Array[Long], hasAux: Boolean,
      inverted: Boolean): Iterator[Row] = {
    val n = xs.length
    val m = n - 1
    // trapezoid slices + exclusive prefix integrals: prefix(i) = C(x_i)
    val slice = new Array[Double](m)
    val prefix = new Array[Double](m + 1)
    var i = 0
    while (i < m) {
      slice(i) = (xs(i + 1) - xs(i)) * (ys(i) + ys(i + 1)) / 2
      prefix(i + 1) = prefix(i) + slice(i)
      i += 1
    }
    // aux slices only where both endpoints are defined; covered time is
    // tracked separately so NA gaps shrink the divisor (the reference's
    // compute-avg-at-position divides by covered x, meanmax.rkt l.204)
    var aSlice: Array[Double] = null
    var aPrefix: Array[Double] = null
    var aTime: Array[Double] = null
    var aOk: Array[Boolean] = null
    if (hasAux) {
      aSlice = new Array[Double](m); aPrefix = new Array[Double](m + 1)
      aTime = new Array[Double](m + 1); aOk = new Array[Boolean](m)
      var j = 0
      while (j < m) {
        aOk(j) = as(j) != null && as(j + 1) != null
        val dt = (xs(j + 1) - xs(j)).toDouble
        aSlice(j) = if (aOk(j)) dt * (as(j) + as(j + 1)) / 2 else 0.0
        aPrefix(j + 1) = aPrefix(j) + aSlice(j)
        aTime(j + 1) = aTime(j) + (if (aOk(j)) dt else 0.0)
        j += 1
      }
    }
    val xLast = xs(n - 1)
    durs.iterator.flatMap { d =>
      var found = false
      var best = 0.0
      var bestPos = 0L
      var bestAT = 0.0
      var bestATime = 0.0
      var t = 0
      var h = 0
      var go = true
      while (h < m && go) {
        val target = xs(h) + d
        if (xLast < target) go = false // later heads are uncovered too
        else {
          while (xs(t + 1) < target) t += 1
          // invariant: xs(t) < target <= xs(t+1) → dt > 0
          val dtT = (xs(t + 1) - xs(t)).toDouble
          val frac = (target - xs(t)).toDouble / dtT
          val total = (prefix(t) + slice(t) * frac) - prefix(h)
          if (!found || (if (inverted) total < best else total > best)) {
            found = true; best = total; bestPos = xs(h)
            if (hasAux) {
              bestAT = (aPrefix(t) + aSlice(t) * frac) - aPrefix(h)
              bestATime = (aTime(t) + (if (aOk(t)) dtT * frac else 0.0)) - aTime(h)
            }
          }
          h += 1
        }
      }
      if (found)
        Iterator.single(Row(key, d, best, bestPos,
          if (hasAux) Double.box(bestAT) else null,
          if (hasAux) Double.box(bestATime) else null))
      else Iterator.empty
    }
  }

  /** Rank per-key bests to the global winner per duration; ties break to
    * earliest position then smallest key (deterministic). Tiny input:
    * |keys|·|durations| rows. */
  private def winners(bests: DataFrame, inverted: Boolean): DataFrame = {
    val order = if (inverted) col("__total").asc else col("__total").desc
    val rank = row_number().over(
      Window.partitionBy("duration").orderBy(order, col("__pos").asc, col("__k").asc))
    bests.withColumn("__rn", rank).filter(col("__rn") === 1)
  }

  /** df-mean-max (meanmax.rkt l.262): for each duration, the best
    * exact-length window average across all keys.
    * Output: (duration, best_avg, best_key, best_pos). Durations with no
    * fully-covered window produce no row (reference emits #f). */
  def meanMax(df: DataFrame, keyCol: String, epochCol: String, valueCol: String,
              durations: Seq[Long], inverted: Boolean = false): DataFrame =
    winners(perKeyBests(df, keyCol, epochCol, valueCol, None, durations, inverted), inverted)
      .select(col("duration"),
        round(col("__total") / col("duration"), 4).as("best_avg"),
        col("__k").as("best_key"), col("__pos").as("best_pos"))

  /** df-mean-max/lap-swim preprocessing (meanmax.rkt l.291): lap-swim
    * frames record one sample per length with NAs at pauses — duplicate
    * each sample at the previous sample's time (start+end of the length)
    * and coalesce NAs to 0 so the trapezoid weights lengths correctly.
    * Returns the expanded (key, eps, value) frame to feed `meanMax`. */
  def lapSwimPrep(df: DataFrame, keyCol: String, epochCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(epochCol))
    val base = df.select(col(keyCol), col(epochCol).cast("long").as(epochCol),
      coalesce(col(valueCol), lit(0.0)).as(valueCol))
      .withColumn("__prev_eps", lag(col(epochCol), 1).over(w))
    val starts = base.filter(col("__prev_eps").isNotNull)
      .select(col(keyCol), col("__prev_eps").as(epochCol), col(valueCol))
    base.select(col(keyCol), col(epochCol), col(valueCol)).union(starts)
  }

  /** df-mean-max-aux (meanmax.rkt l.310): for each duration, the aux
    * series' trapezoid average over the window where the MAIN series
    * attains its best. Output: (duration, best_avg, aux_avg, best_key,
    * best_pos); aux_avg is null when the aux series has no defined
    * samples inside the window. */
  def meanMaxAux(df: DataFrame, keyCol: String, epochCol: String, valueCol: String,
                 auxCol: String, durations: Seq[Long], inverted: Boolean = false): DataFrame =
    winners(perKeyBests(df, keyCol, epochCol, valueCol, Some(auxCol), durations, inverted), inverted)
      .select(col("duration"),
        round(col("__total") / col("duration"), 4).as("best_avg"),
        round(when(col("__atime") > 0, col("__atotal") / col("__atime")), 4).as("aux_avg"),
        col("__k").as("best_key"), col("__pos").as("best_pos"))
}
