package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Core frame operations mirroring the reference's `private/df.rkt`
  * surface (df-select*, df-add-derived!, df-count-na, valid-only,
  * df-fold, df-map with (prev,current), df-describe, …) re-expressed as
  * declarative Spark transforms so Catalyst keeps pushdown/pruning.
  *
  * Reference: /root/reference/private/df.rkt (df-add-derived! l.248,
  * df-count-na l.284, df-map l.946, df-fold l.1056) and
  * /root/reference/private/describe.rkt (df-describe l.29).
  *
  * Scale notes:
  *  - all ops are narrow transforms or hash aggregations (map-side
  *    partial agg) — no driver loops, no global sorts except where the
  *    caller asks for an ordered result.
  *  - windowed ops (`mapWindow`) partition by a key column so window
  *    state is distributed; the unkeyed `isSorted` windows by the
  *    original partition id plus a boundary-row seam check, so even the
  *    reference's single-series semantics never plan a global window.
  */
object FrameOps {

  implicit class RichFrame(val df: DataFrame) extends AnyVal {

    /** df-add-derived!: new column computed from existing ones. */
    def addDerived(name: String, expr: Column): DataFrame = df.withColumn(name, expr)

    /** valid-only: keep rows where all given columns are non-NA. */
    def validOnly(cols: String*): DataFrame =
      df.filter(cols.map(c => col(c).isNotNull).reduce(_ && _))

    /** df-count-na for one series. */
    def countNa(column: String): DataFrame =
      df.agg((count(lit(1)) - count(col(column))).as("na_count"))

    /** df-count-na over several series: one row per series name.
      * Single pass: all counts in one aggregation, then unpivoted. */
    def countNaAll(cols: Seq[String]): DataFrame = {
      val aggs = cols.map(c => (count(lit(1)) - count(col(c))).cast("long").as(c))
      val one = df.agg(aggs.head, aggs.tail: _*)
      val stacked = cols.map(c => s"'$c', `$c`").mkString(", ")
      one.selectExpr(s"stack(${cols.size}, $stacked) as (series, na_count)")
    }

    /** df-has-na? for a series (single-row boolean). */
    def hasNa(column: String): Boolean =
      df.filter(col(column).isNull).limit(1).count() > 0

    /** df-equal-range analog: rows whose sorted-series value is in
      * [lo, hi]. On a sorted/range-partitioned layout this prunes
      * partitions; on parquet it pushes down as a range filter. */
    def equalRange(column: String, lo: Any, hi: Any): DataFrame =
      df.filter(col(column) >= lit(lo) && col(column) <= lit(hi))

    /** df-map with (prev, current) rows: per-key windowed map producing
      * a delta-style column from lag(). `orderCols` must make the order
      * deterministic (include a unique tiebreaker). */
    def mapWindow(partitionCol: String, orderCols: Seq[Column], out: String,
                  f: (Column => Column) => Column): DataFrame = {
      val w = Window.partitionBy(partitionCol).orderBy(orderCols: _*)
      df.withColumn(out, f(c => lag(c, 1).over(w)))
    }

    /** df-map with (prev, current) over the WHOLE frame — the
      * reference's single-series semantics (df.rkt l.946) — without a
      * global window: GlobalOrder boundary exchange keeps every
      * partition working. `f` builds the output from `col(name)`
      * (current) and its prev accessor; `carryCols` lists the columns
      * `f` reads through prev. */
    def mapWindowGlobal(orderCols: Seq[Column], carryCols: Seq[String], out: String,
                        f: (String => Column) => Column): DataFrame =
      GlobalOrder.withPrev(df, orderCols, carryCols)
        .withColumn(out, f(c => col(s"__prev_$c")))
        .drop(carryCols.map(c => s"__prev_$c"): _*)

    /** df-describe: one row per numeric column with count/mean/stddev/
      * min/max. One distributed aggregation, tiny unpivoted result. */
    def describeNumeric(cols: Seq[String]): DataFrame = {
      val aggs = cols.flatMap { c =>
        Seq(count(col(c)).as(s"${c}__cnt"),
            (count(lit(1)) - count(col(c))).cast("long").as(s"${c}__na"),
            avg(col(c)).as(s"${c}__mean"),
            stddev_samp(col(c)).as(s"${c}__stddev"),
            min(col(c)).cast("double").as(s"${c}__min"),
            max(col(c)).cast("double").as(s"${c}__max"))
      }
      val one = df.agg(aggs.head, aggs.tail: _*)
      val stacked = cols.map { c =>
        s"'$c', `${c}__cnt`, `${c}__na`, round(`${c}__mean`, 4), round(`${c}__stddev`, 4), `${c}__min`, `${c}__max`"
      }.mkString(", ")
      one.selectExpr(
        s"stack(${cols.size}, $stacked) as (series, cnt, cnt_na, mean, stddev, min, max)")
    }

    /** Numeric column names (helper for describe). */
    def numericCols: Seq[String] =
      df.schema.fields.collect { case f if f.dataType.isInstanceOf[NumericType] => f.name }.toIndexedSeq

    /** df-is-sorted? (df.rkt): is the series nondecreasing in stored row
      * order (what the reference's sorted flag asserts about its
      * vectors)? Keyed: one window pass per key. Unkeyed: windowing by
      * the ORIGINAL partition id keeps inversion checks distributed
      * (each window = one input partition), and a second, tiny pass
      * compares the #partitions boundary rows — never a global window. */
    def isSorted(column: String, partitionCol: Option[String] = None): Boolean = {
      // both branches check the NON-NA subsequence (NA rows are skipped,
      // not comparison-breaking) so keyed and unkeyed answers agree
      val withPos = df.withColumn("__rid", monotonically_increasing_id())
      partitionCol match {
        case Some(p) =>
          val w2 = Window.partitionBy(p).orderBy(col("__rid"))
          withPos.filter(col(column).isNotNull)
            .withColumn("__prev", lag(col(column), 1).over(w2))
            .filter(col("__prev").isNotNull && col("__prev") > col(column))
            .limit(1).count() == 0
        case None =>
          // sortedness of the non-NA subsequence: drop NA rows AFTER
          // tagging original partition/position so the in-partition lag
          // check and the seam check see the same (non-NA) neighbours —
          // otherwise a null sitting at a partition boundary would make
          // the answer depend on the physical split
          val tagged = withPos.withColumn("__pid", spark_partition_id())
            .filter(col(column).isNotNull)
          val w2 = Window.partitionBy("__pid").orderBy(col("__rid"))
          val inverted = tagged
            .withColumn("__prev", lag(col(column), 1).over(w2))
            .filter(col("__prev").isNotNull && col("__prev") > col(column))
            .limit(1).count() > 0
          if (inverted) false
          else {
            // cross-partition seams: last value of partition p vs first
            // of p+1 — one row per partition, so the unpartitioned
            // window is bounded by the partition count
            val ends = tagged.groupBy("__pid")
              .agg(min_by(col(column), col("__rid")).as("__first"),
                max_by(col(column), col("__rid")).as("__last"))
            val wb = Window.orderBy(col("__pid"))
            ends.withColumn("__pl", lag(col("__last"), 1).over(wb))
              .filter(col("__pl").isNotNull && col("__pl") > col("__first"))
              .limit(1).count() == 0
          }
      }
    }
  }
}
