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
    // no sortCols (bound-files-only call): salt on every column — still
    // pure row content, still retry-deterministic
    val saltCols = (if (sortCols.nonEmpty) sortCols else df.columns.toSeq).map(col)
    val salted = df.withColumn("__split",
      pmod(xxhash64(saltCols: _*), lit(filesPerPartition)))
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

  /** Z-order (Morton-curve) clustering: write the table sorted by the
    * bit-interleaving of its clustering columns' RANK buckets, so
    * every file/row group has tight min/max bounds on ALL clustering
    * columns at once — a single-column sort gives perfect skipping on
    * that column and none on the others; the Z-curve trades a little
    * of the first column's locality for locality on every column
    * (the Delta/Iceberg OPTIMIZE ZORDER move, public shape).
    *
    * Scale anatomy, one write job: (1) one pass computes 2^bits−1
    * approx-quantile boundaries per column (mergeable sketch — rank
    * buckets, not equi-width, so skew can't collapse the curve);
    * (2) per row, bucket = count of boundaries ≤ v via a codegen'd
    * higher-order filter on the broadcast boundary array literal, and
    * the Z-value interleaves the bucket bits with shift/mask
    * arithmetic — no UDF anywhere; (3) a range exchange on the
    * Z-value (Spark's sampled range partitioner) + in-partition sort
    * writes `numFiles` runs of the curve. */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
                    bits: Int = 8, numFiles: Int = 16): Unit = {
    require(zCols.size >= 2, "z-ordering needs at least two columns")
    require(bits >= 1 && bits * zCols.size <= 63,
      s"bits*cols must fit a long, got $bits*${zCols.size}")
    require(numFiles >= 1, "numFiles must be >= 1")
    val nb = (1 << bits) - 1
    val qs = (1 to nb).map(i => i.toDouble / (nb + 1))
    val aggs = zCols.map(c =>
      expr(s"approx_percentile(cast($c as double), array(${qs.mkString(",")}), 10000)")
        .as(s"__b_$c"))
    val row = df.agg(aggs.head, aggs.tail: _*).first()
    val zVal = zCols.zipWithIndex.map { case (c, j) =>
      val bounds = Option(row.getSeq[Double](j)).getOrElse(Seq.empty)
      // rank bucket in [0, 2^bits): boundaries ≤ v, counted by a
      // codegen'd array filter over the literal boundary vector
      // LONG before shifting: int shifts mask the distance to 5 bits,
      // so positions ≥ 31 would wrap/sign-flip and scramble the curve
      val bucket =
        (if (bounds.isEmpty) lit(0)
         else size(filter(typedlit(bounds), b => b <= col(c).cast("double"))))
          .cast("long")
      (bucket, j)
    }.flatMap { case (bucket, j) =>
      (0 until bits).map(i =>
        shiftleft(shiftright(bucket, i).bitwiseAND(lit(1L)), i * zCols.size + j))
    }.reduce(_ + _)
    df.withColumn("__z", zVal)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Compact a parquet table's accumulated small files — the
    * maintenance half of layout management: streaming/incremental
    * writers leave a long tail of KB-scale files whose per-file open
    * cost eventually dominates scans. Rewrites the table through
    * [[writeSorted]] (directory partitioning, in-file sort order, and
    * file counts re-established from scratch) into a sibling temp
    * directory, then swaps it in with two filesystem renames. The
    * swap is not fully atomic on a raw filesystem — there is a
    * two-rename window in which the path is briefly absent, and a
    * scan that LISTED files before the swap fails once the old copy
    * is deleted — so run compaction when the table is not being read
    * (true atomicity needs a metastore/manifest layer on top, which
    * is what table formats exist for). Half-written states are never
    * observable: the new copy is complete before the first rename,
    * and a failed second rename rolls the original back.
    *
    * `filesPerPartition` defaults to re-sizing from the table's actual
    * bytes: ceil(largest LEAF directory / targetFileBytes) — leaf, not
    * top-level, so multi-level partitioning doesn't inflate the count
    * by the inner fan-out — producing proportionally more files after
    * heavy growth rather than one giant row group per directory. */
  def compact(spark: SparkSession, path: String, partCols: Seq[String],
              sortCols: Seq[String], targetFileBytes: Long = 128L << 20,
              filesPerPartition: Int = 0): Unit = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path) // normalizes trailing slashes
    val fs = p.getFileSystem(conf)
    val perDir =
      if (filesPerPartition > 0) filesPerPartition
      else {
        // largest LEAF directory's bytes decide the file count: descend
        // until a directory holds files, not sub-directories
        def maxLeafBytes(d: org.apache.hadoop.fs.Path): Long = {
          val entries = fs.listStatus(d)
          val subdirs = entries.filter(_.isDirectory)
          if (subdirs.isEmpty)
            entries.filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
          else subdirs.map(s => maxLeafBytes(s.getPath)).max
        }
        val maxDir = maxLeafBytes(p)
        math.max(1L, (maxDir + targetFileBytes - 1) / targetFileBytes).toInt
      }
    // siblings of the normalized path — never children of the table
    val tmp = new org.apache.hadoop.fs.Path(p.getParent, p.getName + "__compact_tmp")
    val old = new org.apache.hadoop.fs.Path(p.getParent, p.getName + "__compact_old")
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
