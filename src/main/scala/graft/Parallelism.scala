package graft

import org.apache.spark.sql.DataFrame

/** Guard for CPU-heavy per-row stages (shingle explodes, signature
  * kernels, hyperplane banding): a narrow stage's task count is the
  * incoming plan's partition count, which for a file scan is the
  * parquet split count. Real tables ship ≥cores splits (≈128 MB row
  * groups), but a small file with a single row group pins the whole
  * stage — shingling, MinHash aggregation, plane dots — to ONE task
  * while the other cores idle. When the incoming plan has fewer than
  * half the session's default parallelism, round-robin repartition
  * first: the shuffled bytes are the RAW rows (pre-explode), i.e.
  * precisely the case where the input is small. At scale the branch
  * is a no-op and no shuffle is added.
  */
object Parallelism {
  def spread(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df // partition probing needs a batch plan
    val target = df.sparkSession.sparkContext.defaultParallelism
    // .rdd plans the query (no execution) to read its split count —
    // one extra driver-side planning pass per operator call. File
    // listings behind it are served by the session's shared
    // FileStatusCache, so the probe stays milliseconds even on wide
    // tables; accepted as the price of knowing, rather than guessing,
    // whether the scan supplies enough splits.
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target) else df
  }
}
