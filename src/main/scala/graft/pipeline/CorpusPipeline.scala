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

  case class Config(minWords: Int = 20, maxStopRatio: Double = 0.9,
                    shingleK: Int = 3, minhashPerms: Int = 32, bands: Int = 8,
                    estJaccard: Double = 0.5)

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
    val exactKept = quality.join(
      Dedup.exact(quality, idCol, textCol).select(col("keep_id").as(idCol)), Seq(idCol))
      .localCheckpoint()

    // 3.–4. near-dup candidates → survivor per cluster. Scoped: the
    // signature cache behind `cands` is no longer referenced once
    // survivors() materializes the pairs (eager localCheckpoint), so
    // the scope exit reclaims it — and only it, never a concurrent
    // Dedup caller's still-pending caches.
    val surv = Dedup.withCacheScope {
      val cands = Dedup.minhashCandidates(exactKept, idCol, textCol,
        cfg.shingleK, cfg.minhashPerms, cfg.bands, cfg.estJaccard)
      Dedup.survivors(cands, exactKept.select(col(idCol)), idCol)
    }

    // 5. keep docs that are their own survivor
    exactKept.join(surv.filter(col("id") === col("survivor")).select(col("id").as(idCol)), Seq(idCol))
  }
}
