package graft.pipeline

import graft.dedup.Dedup
import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus cleanup — the composition the individual
  * operators exist for:
  *
  *   1. quality gate (token/stopword features, min thresholds)
  *   2. exact dedup (content-hash, keep min id)
  *   3. near-dup candidates (MinHash + LSH banding)
  *   4. cluster resolution (min-label propagation → survivors)
  *   5. surviving documents out
  *
  * Every stage is a shuffle-bounded DataFrame transform: the pipeline
  * runs unchanged on 500 docs or 100 TB (banding keys all pair work).
  */
object CorpusPipeline {

  /** `exactPairs = true` swaps the near-dup candidate stage from raw
    * MinHash banding to the threshold-Jaccard router
    * ([[graft.dedup.Dedup.ngramJaccardPairsAuto]] at `estJaccard`):
    * every emitted edge then satisfies TRUE Jaccard >= estJaccard
    * (exact join below the banding recall boundary; banded
    * candidates + exact verify above it, per-pair miss <= 1e-9), and
    * — because the edge semantics are then plain relational algebra —
    * the END-TO-END pipeline output becomes checkable against an
    * independent SQL engine. The raw-candidate MinHash default
    * remains the cheap path when verified edges aren't needed. */
  case class Config(minWords: Int = 20, maxStopRatio: Double = 0.9,
                    shingleK: Int = 3, minhashPerms: Int = 32, bands: Int = 8,
                    estJaccard: Double = 0.5, exactPairs: Boolean = false)

  case class GateConfig(minWords: Int = 20, maxStopRatio: Double = 0.9,
                        stopwords: Seq[String] =
                          Seq("the", "a", "of", "and", "to", "in", "is", "it"),
                        shingleK: Int = 5, maxContamination: Double = 0.2,
                        pctByGroup: Map[String, Int] = Map.empty,
                        defaultPct: Int = 100,
                        scrubPii: Boolean = false)

  /** Stateless ingest-time curation gate: quality thresholds, mixture
    * rebalance, and bloom decontamination as ONE projection+filter
    * chain over a single frame — no join, no aggregation, no state.
    * That statelessness is the point: the identical plan runs on a
    * batch table and on a `readStream` source (append mode, no
    * watermark, no state store — spec-pinned batch≡stream), so a
    * crawl can be curated as it arrives at scan-limited rate, with
    * the stateful near-dup gate ([[graft.streaming.DocStreams]]) as
    * the one downstream stage that needs state. Documents with fewer
    * than `shingleK` words have no shingles; their contamination is
    * defined as 0 (nothing to overlap). Output: input columns +
    * n_words, stop_ratio, contamination. */
  def ingestGate(docs: DataFrame, idCol: String, textCol: String, groupCol: String,
                 bloom: graft.functions.BroadcastBloom,
                 cfg: GateConfig = GateConfig()): DataFrame = {
    // PII scrub first (another per-row projection — statelessness
    // preserved): quality features, mixture draw, and contamination
    // shingles all see the text training would see, placeholders
    // included
    val input = if (cfg.scrubPii)
      docs.withColumn(textCol, graft.text.Pii.redactText(col(textCol)))
    else docs
    val gated = input
      .withColumn("__ws", TextAnalysis.words(col(textCol)))
      .withColumn("n_words", size(col("__ws")))
      .withColumn("stop_ratio", when(col("n_words") === 0, 0.0)
        .otherwise(TextAnalysis.stopwordCount(col("__ws"), cfg.stopwords)
          .cast("double") / col("n_words")))
      .filter(col("n_words") >= cfg.minWords && col("stop_ratio") <= cfg.maxStopRatio)
    val mixed = Sampling.mixture(gated, groupCol, idCol, cfg.pctByGroup, cfg.defaultPct)
    mixed
      .withColumn("__sh", when(col("n_words") >= cfg.shingleK,
        Dedup.shingleArray(cfg.shingleK)).otherwise(array().cast("array<string>")))
      .withColumn("contamination", when(size(col("__sh")) === 0, 0.0)
        .otherwise(round(size(filter(col("__sh"),
            s => bloom.mightContain(xxhash64(s)))).cast("double") / size(col("__sh")), 4)))
      .filter(col("contamination") <= cfg.maxContamination)
      .drop("__ws", "__sh")
  }

  /** Returns the cleaned corpus (idCol, textCol rows that survive). */
  def clean(docs: DataFrame, idCol: String, textCol: String,
            cfg: Config = Config()): DataFrame = {
    // 1. quality gate
    val feats = TextAnalysis.quality(docs, textCol, idCol,
      Seq("the", "a", "of", "and", "to", "in", "is", "it"))
    val quality = docs.join(
      feats.filter(col("n_words") >= cfg.minWords && col("stop_ratio") <= cfg.maxStopRatio)
        .select(col(idCol)), Seq(idCol))

    // 2. exact dedup: keep the min-id representative of each hash.
    // Checkpointed: three downstream consumers (candidates, survivor
    // ids, final join) each reuse the materialized rows instead of
    // re-running the quality+exact join chain.
    val exactKept = graft.Checkpoints.checkpoint(quality.join(
      Dedup.exact(quality, idCol, textCol).select(col("keep_id").as(idCol)), Seq(idCol)))

    // 3.–4. near-dup candidates → survivor per cluster. Scoped: the
    // signature cache behind `cands` is no longer referenced once
    // survivors() materializes the pairs (eager localCheckpoint), so
    // the scope exit reclaims it — and only it, never a concurrent
    // Dedup caller's still-pending caches.
    val surv = Dedup.withCacheScope {
      val cands = if (cfg.exactPairs)
        Dedup.ngramJaccardPairsAuto(exactKept, idCol, textCol,
          cfg.shingleK, cfg.estJaccard)
      else Dedup.minhashCandidates(exactKept, idCol, textCol,
        cfg.shingleK, cfg.minhashPerms, cfg.bands, cfg.estJaccard)
      Dedup.survivors(cands, exactKept.select(col(idCol)), idCol)
    }

    // 5. keep docs that are their own survivor
    exactKept.join(surv.filter(col("id") === col("survivor")).select(col("id").as(idCol)), Seq(idCol))
  }
}
