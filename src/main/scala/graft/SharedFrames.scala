package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Cross-query reuse registry for EXPENSIVE intermediates that several
  * registered queries derive from (the suffix-array repeat extents
  * feeding both `q_dup_spans_sa` and `q_dup_passages`; the DSIR
  * weights frame feeding both `q_dsir` and `q_dsir_sample`). A caller
  * that runs both members of such a family pays the construction once.
  *
  * Entries are eager `localCheckpoint`s, NOT catalog caches: a
  * localCheckpoint materializes the rows into executor block storage
  * and detaches the lineage, so it survives `spark.catalog.clearCache()`
  * (the Bench harness's inter-query hygiene clears the catalog between
  * every query — a catalog cache would never live long enough to be
  * shared). Keys are the canonicalized logical plans of the inputs
  * plus the operator parameters, compared with `sameResult`, so two
  * queries reading the same table through different DataFrame objects
  * still hit.
  *
  * Release discipline: entries hold executor storage until released.
  * [[release]] drops the references (the blocks free when the
  * ContextCleaner processes the GC'd RDDs — same lifecycle as every
  * other localCheckpoint in the library); the Bench harness releases a
  * family as soon as the suite moves past it, and library callers
  * should release after the last consumer (or use [[releaseAll]]). */
object SharedFrames {

  private final case class Entry(tag: String, params: Seq[Any],
                                 keys: Seq[LogicalPlan], df: DataFrame,
                                 creator: String)
  private val entries = scala.collection.mutable.ArrayBuffer.empty[Entry]

  /** Label under which [[getOrCompute]] records new entries — the
    * Bench harness sets it to the running query's name so it can
    * release a query's OWN entries between timing iterations (keeping
    * per-query medians honest) while leaving entries an EARLIER query
    * built available for reuse. */
  @volatile var creatorTag: String = ""

  private def keyOf(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed.canonicalized

  /** The memoized frame for (tag, params, inputs), computing and
    * eagerly checkpointing it on first call. `inputs` participate in
    * the key via plan equality, so a different source dir or upstream
    * transform is a different entry. */
  def getOrCompute(tag: String, inputs: Seq[DataFrame], params: Seq[Any])
                  (compute: => DataFrame): DataFrame = {
    val keys = inputs.map(keyOf)
    entries.synchronized {
      entries.find(e => e.tag == tag && e.params == params &&
        e.keys.length == keys.length &&
        e.keys.zip(keys).forall { case (a, b) => a.sameResult(b) })
    } match {
      case Some(e) => e.df
      case None =>
        // compute OUTSIDE the lock (it runs Spark jobs); a concurrent
        // duplicate costs one redundant construction, never correctness
        val df = compute.localCheckpoint(eager = true)
        entries.synchronized { entries += Entry(tag, params, keys, df, creatorTag) }
        df
    }
  }

  /** Drop every entry whose tag fails `keep` — references released,
    * blocks reclaimed by the ContextCleaner after GC. */
  def release(keep: String => Boolean = _ => false): Unit = entries.synchronized {
    val (kept, dropped) = entries.partition(e => keep(e.tag))
    entries.clear(); entries ++= kept
    dropped.foreach(_ => ()) // refs dropped with the buffer rows
  }

  /** Drop entries created under `creator` (see [[creatorTag]]). */
  def releaseCreatedBy(creator: String): Unit = entries.synchronized {
    val kept = entries.filterNot(_.creator == creator)
    entries.clear(); entries ++= kept
  }

  def releaseAll(): Unit = release()

  /** Live tags — spec hook. */
  private[graft] def liveTags: Seq[String] =
    entries.synchronized(entries.map(_.tag).toSeq)
}
