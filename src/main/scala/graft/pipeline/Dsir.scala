package graft.pipeline

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169): tilt a raw crawl toward a target domain by
  * weighting every raw document with the likelihood ratio of a
  * target-domain hashed-n-gram language model over the raw-corpus one,
  * then resampling against those weights. The public method behind
  * "make 100 TB of crawl look like Wikipedia" curation passes.
  *
  * Features are the paper's: unigrams + bigrams of whitespace words,
  * hashed into `buckets` bins. The hash is [[Curation.md5Long]] (not
  * xxhash64) so every count, weight, and draw is engine-portable and
  * the DuckDB oracle recomputes bit-identical selections.
  *
  * Scale shape: each corpus contributes ONE map-side-partial
  * aggregation down to `buckets` rows (the gram explode never
  * shuffles: partials combine per bucket, the exchange carries ≤
  * `buckets` rows per partition); the per-document weight is a
  * broadcast join of that tiny ratio table against the exploded grams,
  * aggregated by document id. The resample is a Gumbel top-k — per
  * partition heaps of k via TakeOrderedAndProject, no global sort. No
  * step materializes anything proportional to the corpus beyond the
  * one keyed per-doc aggregation.
  */
object Dsir {

  private def bucketOf(gram: Column, buckets: Int): Column =
    pmod(Curation.md5Long(gram), lit(buckets.toLong))

  /** (id, bucket) rows for every gram occurrence of `df`. */
  private def bucketed(df: DataFrame, textCol: String, idCol: String,
                       buckets: Int): DataFrame =
    graft.Parallelism.spread(df)
      .withColumn("__dsir_ws", TextAnalysis.words(col(textCol)))
      .select(col(idCol), explode(TextAnalysis.wordGrams("__dsir_ws")).as("__g"))
      .select(col(idCol), bucketOf(col("__g"), buckets).as("bucket"))


  /** Per-bucket log likelihood ratio ln p̂_target(b) − ln q̂_raw(b),
    * Laplace-smoothed over the `buckets` bins so unseen buckets are
    * defined on both sides. Returns exactly `buckets` rows (absent
    * buckets carry the smoothing-only ratio) — driver-free, and small
    * enough to broadcast at any corpus size. */
  def logRatios(target: DataFrame, raw: DataFrame, textCol: String, idCol: String,
                buckets: Int = 10000): DataFrame = {
    require(buckets > 1, s"buckets must be > 1, got $buckets")
    val spark = target.sparkSession
    // dense bucket spine so the ratio table has no holes: unseen
    // target buckets must DOWN-weight docs that hit them, which an
    // inner-join-with-missing-rows formulation would silently skip
    val spine = spark.range(0, buckets).select(col("id").as("bucket"))
    // each counts frame is consumed TWICE (the spine join probe and
    // its own grand total) — tracked-cache the 10k-row aggregates so
    // the corpus-scale gram explode beneath each runs ONCE per corpus.
    // Spark's exchange reuse is not guaranteed across the ScalarAttach
    // build/probe boundary: the round-11 sf10 A-B measured the rTot
    // subtree re-running the full raw explode (~3.4 s of q_dsir's
    // 1.6x-vs-r7 regression); the cache is lazy (no job at frame
    // CONSTRUCTION — the plan-audit laziness rule) and 10k rows tiny.
    def counts(df: DataFrame) = graft.dedup.Dedup.cached(
      bucketed(df, textCol, idCol, buckets).groupBy("bucket")
        .agg(count(lit(1)).as("c")))
    val t = counts(target)
    val r = counts(raw)
    val tTot = t.agg(sum("c").as("__tt"))
    val rTot = r.agg(sum("c").as("__rt"))
    graft.operators.ScalarAttach.attach(graft.operators.ScalarAttach.attach(
      spine
        .join(t.withColumnRenamed("c", "ct"), Seq("bucket"), "left")
        .join(r.withColumnRenamed("c", "cr"), Seq("bucket"), "left"),
      tTot), rTot)
      .select(col("bucket"),
        (log((coalesce(col("ct"), lit(0L)).cast("double") + 1.0) /
            (col("__tt").cast("double") + buckets)) -
          log((coalesce(col("cr"), lit(0L)).cast("double") + 1.0) /
            (col("__rt").cast("double") + buckets))).as("log_ratio"))
  }

  /** Unrounded per-doc weight sum — rounding happens only at each
    * output surface (cross-engine float discipline: arithmetic on an
    * already-rounded value creates half-decimal oracle boundaries).
    * Memoized through [[graft.SharedFrames]] (eager localCheckpoint
    * keyed on the raw-corpus and ratio plans): the gram explode over
    * the raw corpus is the dominant cost of BOTH
    * [[importanceLogWeights]] and [[sample]], and a pipeline that
    * scores then resamples the same corpus (the standard DSIR flow)
    * pays it once. Release with `SharedFrames.release` after the
    * last consumer. */
  private def weightsRaw(raw: DataFrame, ratios: DataFrame, textCol: String,
                         idCol: String, buckets: Int): DataFrame =
    graft.SharedFrames.getOrCompute("dsir_weights", Seq(raw, ratios),
      Seq(textCol, idCol, buckets)) {
      bucketed(raw, textCol, idCol, buckets)
        .join(broadcast(ratios), Seq("bucket"))
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("n_grams"), sum("log_ratio").as("__lw"))
    }

  /** Per-document importance log-weight: Σ_grams log_ratio(bucket(g)).
    * Returns (idCol, n_grams, log_w rounded 4). Documents with no
    * words produce no row. */
  def importanceLogWeights(raw: DataFrame, ratios: DataFrame, textCol: String,
                           idCol: String, buckets: Int = 10000): DataFrame =
    weightsRaw(raw, ratios, textCol, idCol, buckets)
      .select(col(idCol), col("n_grams"), round(col("__lw"), 4).as("log_w"))

  /** Deterministic importance resample: top-k documents by the Gumbel
    * key log_w − ln(−ln u), with u the stable md5 uniform of
    * ("dsir:" ++ id) — the Gumbel-top-k identity makes this an exact
    * without-replacement sample with inclusion ∝ exp(log_w), computed
    * entirely in log space (no exp overflow) and reproducible on any
    * engine (the "dsir:" salt keeps the draw independent of
    * hashSplit/mixture draws on the same ids, the round-6 correlation
    * lesson). Output: (idCol, n_grams, log_w, g) ordered by g desc,
    * id tie-break (both engines cut the same k-boundary). */
  def sample(raw: DataFrame, target: DataFrame, textCol: String, idCol: String,
             k: Int, buckets: Int = 10000): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val ratios = logRatios(target, raw, textCol, idCol, buckets)
    val w = weightsRaw(raw, ratios, textCol, idCol, buckets)
    val u = Sampling.hashUniform(concat(lit("dsir:"), col(idCol).cast("string")))
    w.select(col(idCol), col("n_grams"), round(col("__lw"), 4).as("log_w"),
        round(col("__lw") - log(-log(u)), 4).as("g"))
      .orderBy(col("g").desc, col(idCol))
      .limit(k)
  }
}
