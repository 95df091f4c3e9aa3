package graft.similarity

import graft.functions.BroadcastCentroids
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN: k-means coarse quantizer → per-centroid
  * posting lists → probe only the `nprobe` nearest lists.
  *
  * Scale shape: training runs Lloyd iterations as DataFrame jobs over
  * a (sampled) corpus — assignment is a codegen'd argmin over a
  * broadcast k×dim matrix ([[graft.functions.NearestCentroids]]; one
  * plan node regardless of k, so a production coarse quantizer with
  * k = 1024–65536 cells plans exactly like the k = 8 demo), the
  * update is one groupBy over exploded (cluster, dim) pairs; the
  * driver only ever holds the k×dim centroid matrix. Search is an
  * equi-join corpus(cid) ⋈ probes(cid ∈ nprobe nearest) — no all-pairs
  * work anywhere. Deterministic: hash-ordered init sample, fixed
  * iteration count.
  *
  * Highest recall per nprobe of the ANN family (0.87/0.92 @ nprobe=256
  * at 200k/2M vectors, BENCH_pq_recall_r17.json) at the price of
  * shipping full vectors (312 B/candidate) through the posting
  * exchange; when that exchange dominates, use the PQ rows instead —
  * SURVEY §2 row 55d is the measured chooser.
  */
object Ivf {

  /** Deterministic bounded training sample: keep rows whose md5-hash
    * uniform draw falls under maxRows/n — a per-row filter (NO
    * shuffle, NO global sort), so it parallelizes like the scan
    * itself at 100 TB. Expected sample size is min(maxRows, n) with
    * binomial jitter (training cares about coverage, not an exact
    * count). maxRows <= 0 means "train on everything".
    *
    * The ratio's denominator: counting `df` itself is metadata-only
    * ONLY when df is a plain parquet scan — on a derived frame (e.g.
    * the PQ trainers' normalized projection) it pays a full computed
    * pass per call (caught by r16 review). Callers holding a derived
    * frame pass the RAW table's count via `totalRows`; an overcount
    * from rows the projection drops merely shrinks the sample ratio,
    * never inflates it. */
  private[graft] def trainSample(df: DataFrame, idCol: String,
                                 maxRows: Long, totalRows: Long = -1L): DataFrame =
    if (maxRows <= 0) df
    else {
      val n = if (totalRows >= 0) totalRows else df.count()
      if (n <= maxRows) df
      else df.filter(graft.pipeline.Sampling.hashUniform(col(idCol)) <=
        lit(maxRows.toDouble / n))
    }

  /** Lloyd's k-means with deterministic init (xxhash64-ordered rows).
    * Returns the centroid matrix. `maxTrainRows > 0` trains on a
    * deterministic hash sample of at most ~that many rows (the 100 TB
    * path: the quantizer needs coverage, not the full corpus — see
    * [[trainSample]]); encode/search still read everything.
    * `totalRows` optionally supplies the sample ratio's denominator
    * when `df` is a derived frame whose count is not metadata-only.
    *
    * Fail-loud contract (since r16; previously a < k-row corpus
    * silently trained a smaller-but-working index): training input
    * with fewer than k rows throws. When sampling, `maxTrainRows`
    * must be ≥ 10·k at call time so the hash sample's binomial jitter
    * cannot trip that require stochastically. */
  def train(df: DataFrame, idCol: String, vecCol: String, k: Int,
            iters: Int = 5, maxTrainRows: Long = 0L,
            totalRows: Long = -1L): Array[Array[Double]] = {
    require(maxTrainRows <= 0 || maxTrainRows >= 10L * k,
      s"maxTrainRows=$maxTrainRows must comfortably exceed k=$k (>= ${10L * k}) " +
        "so binomial sample jitter cannot leave the init short of k rows")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val spark = df.sparkSession
    val base = trainSample(df, idCol, maxTrainRows, totalRows)
      .select(col(idCol).as("__id"), Cosine.toDouble(col(vecCol)).as("__vd"))
      .cache()
    try {
      var cents = base.orderBy(xxhash64(col("__id"))).limit(k)
        .select("__vd").collect().map(_.getSeq[Double](0).toArray)
      require(cents.length == k,
        s"training input has only ${cents.length} rows < k=$k" +
          (if (maxTrainRows > 0) s" (maxTrainRows=$maxTrainRows — raise it)" else ""))
      for (_ <- 1 to iters) {
        val bc = BroadcastCentroids(spark, cents)
        val assigned = base.withColumn("__cid", bc.nearestOne(col("__vd")))
        val sums = assigned
          .select(col("__cid"), posexplode(col("__vd")).as(Seq("__i", "__x")))
          .groupBy("__cid", "__i").agg(avg("__x").as("__m"))
          .collect()
        // the iteration's jobs have run — the executor copies can go
        bc.destroy()
        val next = cents.map(_.clone())
        sums.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
        cents = next
      }
      cents
    } finally base.unpersist()
  }

  /** IVF top-k search: corpus in posting lists by nearest centroid;
    * each probe scans its `nprobe` nearest lists. The returned plan is
    * lazy; the broadcast centroid matrix stays referenced by it and is
    * released by Spark's ContextCleaner when the plan is dropped. */
  def topK(corpus: DataFrame, probes: DataFrame, idCol: String, vecCol: String,
           k: Int, centroids: Array[Array[Double]], nprobe: Int = 2): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val bc = BroadcastCentroids(corpus.sparkSession, centroids)
    val c = Cosine.withNorm(corpus, vecCol)
      .withColumn("__cid", bc.nearestOne(col("__vd")))
      .select(col("__cid"), col(idCol).as("neighbor_id"), col("__vd").as("v2"), col("__nrm").as("n2"))
    // nprobe nearest centroids per probe
    val p = Cosine.withNorm(probes, vecCol)
      .select(col(idCol).as("probe_id"), col("__vd").as("v1"), col("__nrm").as("n1"),
        explode(bc.nearest(col("__vd"), nprobe)).as("__cid"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id"))
    p.join(c, Seq("__cid"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos", Cosine.dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"), round(col("cos"), 4).as("cos"))
  }
}
