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

  /** Bucketed persistent layout for shuffle-free repeated lookups. */
  def bucketed(df: DataFrame, table: String, column: String, buckets: Int): Unit =
    df.write.mode("overwrite").bucketBy(buckets, column).sortBy(column).saveAsTable(table)

  /** df-index-of: first row (by `orderCol`) with column = value. */
  def indexOf(df: DataFrame, column: String, value: Any, orderCol: String): Option[Any] = {
    val rows = df.filter(col(column) === lit(value)).orderBy(col(orderCol)).limit(1)
      .select(orderCol).collect()
    rows.headOption.map(_.get(0))
  }

  /** df-all-indices-of: every matching row id. */
  def allIndicesOf(df: DataFrame, column: String, value: Any, idCol: String): DataFrame =
    df.filter(col(column) === lit(value)).select(idCol)

  /** df-equal-range on the indexed layout (partition-pruned scan). */
  def equalRange(df: DataFrame, column: String, lo: Any, hi: Any): DataFrame =
    df.filter(col(column) >= lit(lo) && col(column) <= lit(hi))
}
