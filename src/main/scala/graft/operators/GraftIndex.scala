package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Secondary-index analog (/root/reference/private/df.rkt
  * df-add-index!/df-index-of/df-equal-range).
  *
  * A Racket frame's secondary index is a sorted permutation enabling
  * O(log n) point/range lookups. The distributed analogs:
  *
  *  - **Range layout** (`rangeIndexed`): repartitionByRange + sort
  *    within partitions on the index column. Point/range predicates
  *    then prune partitions (and parquet row groups when persisted) —
  *    the 100 TB equivalent of binary search.
  *  - **Bucket layout** (`bucketed`): hash-bucketed write so repeated
  *    equi-joins/lookups on the key skip the shuffle entirely.
  *
  * `indexOf` / `equalRange` / `allIndicesOf` then run as pruned scans
  * over the laid-out frame.
  */
object GraftIndex {

  /** df-add-index!: materialize a range-sorted layout on `column`. */
  def rangeIndexed(df: DataFrame, column: String, partitions: Int = 0): DataFrame = {
    val n = if (partitions > 0) partitions else df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartitionByRange(n, col(column)).sortWithinPartitions(column)
  }

  /** Bucketed persistent layout for shuffle-free repeated lookups.
    * Drops any prior incarnation first: a managed table written by a
    * PREVIOUS session survives on disk while the in-memory catalog
    * forgets it, and overwrite-CTAS then refuses with
    * LOCATION_ALREADY_EXISTS — so both the catalog entry and any stale
    * location are cleared before the write. */
  def bucketed(df: DataFrame, table: String, column: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").bucketBy(buckets, column).sortBy(column).saveAsTable(table)
  }

  /** df-index-of: first row (by `orderCol`) with column = value. */
  def indexOf(df: DataFrame, column: String, value: Any, orderCol: String): Option[Any] = {
    val rows = df.filter(col(column) === lit(value)).orderBy(col(orderCol)).limit(1)
      .select(orderCol).collect()
    rows.headOption.map(_.get(0))
  }

  /** df-all-indices-of: every matching row id. */
  def allIndicesOf(df: DataFrame, column: String, value: Any, idCol: String): DataFrame =
    df.filter(col(column) === lit(value)).select(idCol)

  private def probeFrame(df: DataFrame, values: Seq[Any]) =
    broadcast(df.sparkSession.range(1)
      .select(explode(array(values.map(lit).toIndexedSeq: _*)).as("probe")))

  /** df-index-of* (df.rkt l.429): lower-bound positions for a BATCH of
    * probe values — for each probe, the `orderCol` id of the first row
    * (by column asc, orderCol asc) whose value is >= the probe
    * (`exact`: = the probe); null when no row qualifies, mirroring the
    * reference's insertion-point-past-the-end. One broadcast join + one
    * aggregation for the whole batch — never |values| scans. */
  def indexOfAll(df: DataFrame, column: String, values: Seq[Any], orderCol: String,
                 exact: Boolean = false): DataFrame = {
    val probes = probeFrame(df, values)
    val joined =
      if (exact) df.join(probes, col(column) === col("probe"))
      else df.join(probes, col(column) >= col("probe"))
    val hits = joined.groupBy("probe")
      .agg(min(struct(col(column), col(orderCol))).as("__m"))
      .select(col("probe"), col(s"__m.$orderCol").as("index"))
    probes.join(hits, Seq("probe"), "left")
  }

  /** df-lookup* (df.rkt l.489): batched keyed lookup — for each probe
    * value over `baseCol`, the `valueCols` of the lower-bound row
    * (nulls when the probe exceeds the series maximum, the reference's
    * NA-past-the-end). Same single join + aggregation shape. */
  def lookupAll(df: DataFrame, baseCol: String, valueCols: Seq[String], values: Seq[Any],
                orderCol: String, exact: Boolean = false): DataFrame = {
    val probes = probeFrame(df, values)
    val joined =
      if (exact) df.join(probes, col(baseCol) === col("probe"))
      else df.join(probes, col(baseCol) >= col("probe"))
    val hits = joined.groupBy("probe")
      .agg(min_by(struct(valueCols.map(col).toIndexedSeq: _*),
        struct(col(baseCol), col(orderCol))).as("__v"))
      .select(col("probe") +: valueCols.map(c => col(s"__v.$c").as(c)): _*)
    probes.join(hits, Seq("probe"), "left")
  }

  /** df-equal-range on the indexed layout (partition-pruned scan). */
  def equalRange(df: DataFrame, column: String, lo: Any, hi: Any): DataFrame =
    df.filter(col(column) >= lit(lo) && col(column) <= lit(hi))
}
