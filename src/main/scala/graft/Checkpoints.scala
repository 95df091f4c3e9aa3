package graft

import org.apache.spark.sql.DataFrame

/** Lineage-truncation router: every load-bearing checkpoint in the
  * library (SharedFrames entries, dedup survivor rounds, the
  * suffix-array doubling loop's frozen pieces) goes through here.
  *
  * Default: `localCheckpoint` — blocks live in executor storage, no
  * filesystem round-trip. The right call on a single JVM and on
  * healthy clusters: Spark replicates local checkpoint blocks lazily
  * only if asked, so the trade is speed vs executor-loss tolerance.
  *
  * RELIABLE MODE (opt-in for long multi-round jobs on real clusters):
  * set `spark.graft.reliableCheckpoints=true` in the session conf AND
  * `sparkContext.setCheckpointDir(<fault-tolerant path>)` — each
  * checkpoint then writes through [[org.apache.spark.sql.Dataset
  * .checkpoint]] to the checkpoint dir (HDFS/object store) and
  * survives executor loss. Why this matters specifically here: a LOST
  * local checkpoint is not recomputable — `localCheckpoint` severs
  * lineage by design, so Spark FAILS the job rather than recompute
  * (and even with lineage, the SA loop's frozenParts chain would make
  * recompute quadratic in rounds: round r's pieces derive from round
  * r−1's checkpoints, which are themselves gone). On a 1000-executor
  * run whose suffix ordering takes tens of rounds, the probability of
  * losing one executor mid-query is material; reliable mode converts
  * that from job failure into one filesystem write per round.
  *
  * Operational notes for reliable mode: checkpoint FILES are not
  * removed when the frame is unpersisted — set
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (asynchronous,
  * best-effort) or clean the checkpoint dir per job. If the conf flag
  * is set without a checkpoint dir, Spark fails fast with
  * "Checkpoint directory has not been set" at the first checkpoint —
  * deliberate (a silent local fallback would defeat the opt-in). */
object Checkpoints {

  /** Session-conf flag; runtime-settable (`spark.conf.set`). */
  val ConfKey = "spark.graft.reliableCheckpoints"

  def checkpoint(df: DataFrame, eager: Boolean = true): DataFrame =
    if (df.sparkSession.conf.get(ConfKey, "false").toBoolean)
      df.checkpoint(eager = eager)
    else
      df.localCheckpoint(eager = eager)

  /** Free a SUPERSEDED checkpoint's storage blocks, immediately.
    *
    * Why `Dataset.unpersist()` cannot do this: a checkpointed frame's
    * blocks were persisted directly on the underlying RDD (inside
    * `localCheckpoint`), never registered with the SQL CacheManager —
    * so `Dataset.unpersist()`, which only un-caches InMemoryRelation
    * entries, is a silent no-op on them. Absent an explicit free, the
    * blocks live until the driver GCs the RDD reference AND the
    * ContextCleaner notices — and a driver running an iterative loop
    * holds little heap, so GC rarely fires and superseded rounds
    * accumulate. Measured: the SA doubling loop at sf100 piled up
    * 51.7 GB of dead generations and hit this container's disk guard
    * (`BENCH_sa_sf100_r18.json`).
    *
    * The frame must be PROVABLY dead: a local checkpoint cannot be
    * recomputed (lineage is severed by design), so a read after free
    * fails the job loudly rather than silently recomputing — the
    * loops that call this free only frames whose every consumer was
    * itself eagerly checkpointed first. Reliable-mode checkpoints
    * (`df.checkpoint`) keep their files — `unpersist` drops only
    * block-manager copies; file cleanup stays with
    * `spark.cleaner.referenceTracking.cleanCheckpoints` as documented
    * above. Non-checkpoint frames are left untouched. */
  def free(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case lr: org.apache.spark.sql.execution.LogicalRDD =>
      lr.rdd.unpersist(blocking = false)
    case _ => ()
  }
}
