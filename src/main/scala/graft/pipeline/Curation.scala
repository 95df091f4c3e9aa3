package graft.pipeline

import graft.dedup.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-curation utilities for training pipelines: deterministic
  * content-hash splits and benchmark-contamination detection.
  *
  * Both are pure relational shapes: the split is a per-row expression
  * (no shuffle at all), contamination is one shingle equi-join where
  * the benchmark side is small enough to broadcast.
  */
object Curation {

  /** Stable bucket in [0,100) from the md5 of a key's string form —
    * reproducible across runs, engines, and cluster sizes, unlike
    * rand()-based sampling (and expressible in any engine with md5,
    * which is what the DuckDB oracle checks). */
  def hashBucket(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % 100

  /** Deterministic train/holdout split: rows whose key hashes below
    * `holdoutPct` go to "holdout". The same key always lands in the
    * same split — the property dataset dedup/eval hygiene needs. */
  def hashSplit(df: DataFrame, keyCol: String, holdoutPct: Int): DataFrame =
    df.withColumn("bucket", hashBucket(col(keyCol)))
      .withColumn("split",
        when(col("bucket") < holdoutPct, lit("holdout")).otherwise(lit("train")))

  /** Benchmark contamination: for each corpus document, how many of its
    * k-word shingles appear verbatim in the benchmark set (the
    * training-data decontamination check). Returns (idCol, n_shingles,
    * overlap, contamination = overlap/n_shingles). Documents shorter
    * than k words produce no row (they have no shingles to match). */
  def contamination(corpus: DataFrame, benchmark: DataFrame, idCol: String,
                    textCol: String, k: Int = 8): DataFrame = {
    // two consumers (sizes, hits) → materialize the shingle explode once
    val cs = Dedup.shingles(corpus, idCol, textCol, k).cache()
    // only the benchmark's TEXT matters — don't require it to carry the
    // corpus's id column
    val bs = Dedup.shingles(benchmark.select(lit(0L).as("__bid"), col(textCol)),
        "__bid", textCol, k)
      .select("shingle").distinct()
    val sizes = cs.groupBy(col(idCol)).agg(count(lit(1)).as("n_shingles"))
    val hits = cs.join(broadcast(bs), Seq("shingle"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("overlap"))
    sizes.join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("overlap"), lit(0L)).as("overlap"),
        round(coalesce(col("overlap"), lit(0L)).cast("double") / col("n_shingles"), 4)
          .as("contamination"))
  }
}
