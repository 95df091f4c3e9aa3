package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-layout management for the write side of a 100 TB pipeline:
  * directory partitioning for planner-time pruning, in-file ordering
  * for parquet row-group (min/max) skipping, and file-count control.
  *
  * Why each knob matters at scale:
  *
  *   - `partitionBy` alone is a small-file bomb: every write task
  *     holds an open writer per partition value it sees, so T tasks ×
  *     P directories → T·P files (and T·P writer buffers in memory).
  *     Repartitioning BY THE PARTITION COLUMNS first routes each
  *     directory's rows to one task: exactly `filesPerPartition`
  *     files per directory, bounded writer memory.
  *   - `sortWithinPartitions` on the probe columns gives every parquet
  *     row group tight min/max bounds on them, so point/range reads
  *     skip row groups inside the files the directory pruning kept.
  *   - Readers need no special API — `spark.read.parquet(path)
  *     .filter(...)` gets directory pruning at planning time
  *     (PartitionFilters) and row-group skipping at scan time
  *     (PushedFilters), which LayoutSpec pins via scan metrics.
  *
  * Reference scope note: alex-hhh/data-frame ships value-level sinks
  * only (df-write/csv — csv.rkt); layout management is part of graft's
  * LLM-pipeline extension surface (SURVEY.md §2 #67).
  */
object Layout {

  /** Write `df` as parquet partitioned by `partCols`, each directory
    * holding `filesPerPartition` files sorted within by `sortCols`.
    *
    * The shuffle keys on (partCols, file split) — a salt in
    * [0, filesPerPartition) — so directory fan-in is explicit, then
    * sorts (partCols, sortCols) WITHIN partitions only: no global
    * range exchange, and each task writes one run of one directory.
    *
    * The salt hashes the ROW CONTENT (sort columns), never a
    * nondeterministic expression like monotonically_increasing_id: a
    * map task recomputed after executor loss must route every row to
    * the same reducer as the fetched copies of its first run, or the
    * written table silently gains/loses rows. Determinism costs split
    * balance only when sortCols are low-cardinality — rows with equal
    * keys land in one file, which the sort would cluster anyway. */
  def writeSorted(df: DataFrame, path: String, partCols: Seq[String],
                  sortCols: Seq[String], filesPerPartition: Int = 1): Unit = {
    require(partCols.nonEmpty, "partCols must be non-empty")
    require(filesPerPartition >= 1, "filesPerPartition must be >= 1")
    val salted = df.withColumn("__split",
      pmod(xxhash64(sortCols.map(col): _*), lit(filesPerPartition)))
    salted
      .repartition((partCols.map(col) :+ col("__split")): _*)
      .sortWithinPartitions((partCols ++ sortCols).map(col): _*)
      .drop("__split")
      .write.partitionBy(partCols: _*).mode("overwrite").parquet(path)
  }

  /** Read a [[writeSorted]] table. Plain `spark.read.parquet` — the
    * layout benefits need no reader cooperation; this exists so call
    * sites document intent. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Compact a parquet table's accumulated small files — the
    * maintenance half of layout management: streaming/incremental
    * writers leave a long tail of KB-scale files whose per-file open
    * cost eventually dominates scans. Rewrites the table through
    * [[writeSorted]] (directory partitioning, in-file sort order, and
    * file counts re-established from scratch) into a sibling temp
    * directory, then swaps it in with two filesystem renames — readers
    * never observe a half-written table, only strictly-before or
    * strictly-after.
    *
    * `filesPerPartition` defaults to re-sizing from the table's actual
    * bytes: ceil(largest directory / targetFileBytes), so a compaction
    * after heavy growth produces proportionally more files rather than
    * one giant row group per directory. */
  def compact(spark: SparkSession, path: String, partCols: Seq[String],
              sortCols: Seq[String], targetFileBytes: Long = 128L << 20,
              filesPerPartition: Int = 0): Unit = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val perDir =
      if (filesPerPartition > 0) filesPerPartition
      else {
        // largest leaf directory's bytes decide the file count
        def dirBytes(d: org.apache.hadoop.fs.Path): Long =
          fs.listStatus(d).map(s =>
            if (s.isDirectory) dirBytes(s.getPath)
            else if (s.getPath.getName.endsWith(".parquet")) s.getLen else 0L).sum
        val leaves = fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
        val maxDir = if (leaves.isEmpty) dirBytes(p) else leaves.map(dirBytes).max
        math.max(1L, (maxDir + targetFileBytes - 1) / targetFileBytes).toInt
      }
    val tmp = new org.apache.hadoop.fs.Path(path + "__compact_tmp")
    val old = new org.apache.hadoop.fs.Path(path + "__compact_old")
    fs.delete(tmp, true)
    fs.delete(old, true)
    writeSorted(spark.read.parquet(path), tmp.toString, partCols, sortCols, perDir)
    if (!fs.rename(p, old)) throw new java.io.IOException(s"compact: cannot move $p aside")
    if (!fs.rename(tmp, p)) { // roll back
      fs.rename(old, p)
      throw new java.io.IOException(s"compact: cannot move $tmp into place")
    }
    fs.delete(old, true)
  }
}
