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

  /** Under this plan-stat size the repartition is pure tax: exploding
    * a couple of MB on one core is faster than paying a round-robin
    * exchange (measured: the unconditional r5 spread cost the four
    * smallest-input dedup/text queries 40-80% at sf0.1 — an A-B-A
    * same-session bisect against r4 code, 2.3 s vs 3.7 s — while the
    * corpus there is a single 584 KB parquet file). At 4 MiB+ of scan
    * input a pinned stage is seconds of single-core work and the
    * exchange wins. */
  private val MinSpreadBytes = BigInt(4L << 20)

  def spread(df: DataFrame): DataFrame = spread(df, 1)

  /** Work-aware spread (guide §2: partition by WORK, not bytes — the
    * r19 census caught a 5.65 s single-task probe-enumeration stage
    * behind a 580 KB scan): `workHint` is the operator's rough
    * per-byte work multiple relative to the baseline shingle explode
    * the 4 MiB gate was measured on, and it divides the byte gate —
    * an operator doing ~100× the work per input byte (the PassJoin
    * probe enumeration at ~(τ+1)²·c rows per head, the suffix
    * position explode) earns the exchange at ~40 KB of input, where
    * a plain explode still doesn't. The hint affects only WHEN the
    * round-robin exchange is inserted, never results; at real scale
    * factors every caller is past both gates and the branch is the
    * same no-op as before. */
  def spread(df: DataFrame, workHint: Int): DataFrame = {
    if (df.isStreaming) return df // partition probing needs a batch plan
    val target = df.sparkSession.sparkContext.defaultParallelism
    // .rdd plans the query (no execution) to read its split count —
    // one extra driver-side planning pass per operator call. File
    // listings behind it are served by the session's shared
    // FileStatusCache, so the probe stays milliseconds even on wide
    // tables; accepted as the price of knowing, rather than guessing,
    // whether the scan supplies enough splits. Plan-stat sizeInBytes
    // (the scan's file bytes) gates out inputs too small for the
    // exchange to ever pay for itself.
    if (df.rdd.getNumPartitions * 2 < target &&
        df.queryExecution.optimizedPlan.stats.sizeInBytes >
          MinSpreadBytes / math.max(1, workHint))
      df.repartition(target)
    else df
  }
}
