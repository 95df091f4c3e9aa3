package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Thin frame wrapper completing the reference's frame-management API
  * (/root/reference/private/df.rkt): named series add/del/rename/
  * duplicate, properties (df-put-property! etc.), shallow copy,
  * row count / contains, and point access.
  *
  * Divergences, by design for scale:
  *  - immutable: mutators return a new Frame (Spark plans are DAGs,
  *    not mutable vectors); `df-set!` becomes a declarative
  *    `setWhere` that rewrites matching cells.
  *  - `df-ref` by positional row index only makes sense on an ordered
  *    frame; `refBy` does a keyed point lookup instead (broadcast-hash
  *    at scale), which is what the reference's index-based refs do.
  */
final case class Frame(df: DataFrame, properties: Map[String, Any] = Map.empty,
                       contracts: Map[String, Column] = Map.empty,
                       indices: Map[String, String] = Map.empty) {

  // ---- series management -------------------------------------------------
  def seriesNames: Seq[String] = df.columns.toSeq
  def contains(names: String*): Boolean = names.forall(df.columns.contains)
  def containsAny(names: String*): Boolean = names.exists(df.columns.contains)
  def rowCount: Long = df.count()

  /** df-add-series! (from an expression over existing series). */
  def addSeries(name: String, expr: Column): Frame = copy(df = df.withColumn(name, expr))
  /** df-add-lazy!: identical to addSeries — every Spark column is lazy
    * until an action runs, which is exactly the reference's lazy-series
    * semantics (computed on first use). */
  def addLazySeries(name: String, expr: Column): Frame = addSeries(name, expr)
  /** df-del-series! — also drops the series' contract and any index
    * registered on it, so the registries never point at missing
    * columns. */
  def delSeries(name: String): Frame = copy(df = df.drop(name),
    contracts = contracts - name,
    indices = indices.filter { case (_, c) => c != name })
  /** df-rename-series! — contracts/indices follow the rename. */
  def renameSeries(from: String, to: String): Frame = copy(
    df = df.withColumnRenamed(from, to),
    contracts = contracts.map { case (k, v) => (if (k == from) to else k) -> v },
    indices = indices.map { case (k, c) => k -> (if (c == from) to else c) })
  /** df-duplicate-series. */
  def duplicateSeries(name: String, as: String): Frame = copy(df = df.withColumn(as, col(name)))
  /** df-shallow-copy (plans are immutable — same plan, same props). */
  def shallowCopy: Frame = copy()

  // ---- properties --------------------------------------------------------
  def putProperty(key: String, value: Any): Frame = copy(properties = properties + (key -> value))
  def delProperty(key: String): Frame = copy(properties = properties - key)
  def getProperty(key: String): Option[Any] = properties.get(key)
  def propertyNames: Seq[String] = properties.keys.toSeq

  // ---- contracts (df-set-contract!) --------------------------------------
  /** df-set-contract! analog: attach a row-level predicate to a series.
    * Plans are immutable, so enforcement is an explicit check rather
    * than a mutation hook; the NA value for every series is SQL NULL
    * (df-na-value). Contracts live in their own registry — they never
    * appear in `propertyNames`. */
  def setContract(series: String, predicate: Column): Frame =
    copy(contracts = contracts + (series -> predicate))

  /** Rows violating each attached contract (violation = predicate false
    * or null on a non-NA value; NA rows are exempt like the reference's
    * contracts, which only see present values). 0 everywhere = frame
    * honors its contracts. */
  def checkContracts(): Map[String, Long] =
    contracts.map { case (series, p) =>
      series -> df.filter(col(series).isNotNull && !coalesce(p, lit(false))).count()
    }

  /** df-has-non-na?. */
  def hasNonNa(series: String): Boolean =
    df.filter(col(series).isNotNull).limit(1).count() > 0

  // ---- named secondary indices (df-add-index!) ---------------------------
  /** df-add-index! analog: register a named index on a series. The
    * layout (range partition + in-partition sort — the distributed
    * binary-search surface) is a plan, produced on use via `indexed`.
    * Indices live in their own registry, separate from properties. */
  def addIndex(name: String, column: String): Frame =
    copy(indices = indices + (name -> column))
  def delIndex(name: String): Frame = copy(indices = indices - name)
  def indexNames: Seq[String] = indices.keys.toSeq
  /** df-index-series: the series a named index covers. */
  def indexSeries(name: String): Option[String] = indices.get(name)
  /** The range-sorted layout for a registered index. */
  def indexed(name: String): Option[DataFrame] =
    indexSeries(name).map(c => graft.operators.GraftIndex.rangeIndexed(df, c))

  // ---- point access ------------------------------------------------------
  /** df-ref analog: value of `valueCol` at the row where keyCol = key. */
  def refBy(keyCol: String, key: Any, valueCol: String): Option[Any] = {
    val rows = df.filter(col(keyCol) === lit(key)).select(valueCol).limit(1).collect()
    rows.headOption.map(r => if (r.isNullAt(0)) null else r.get(0))
  }

  /** df-set! analog: new frame with `valueCol` rewritten to `value`
    * where cond holds. */
  def setWhere(cond: Column, valueCol: String, value: Any): Frame =
    copy(df = df.withColumn(valueCol, when(cond, lit(value)).otherwise(col(valueCol))))

  /** in-data-frame generator analog: a driver-side row iterator over
    * selected series (bounded memory — one partition at a time). Use
    * only for driver-side consumption of small/ordered results; bulk
    * processing belongs in transforms. */
  def iterate(cols: String*): Iterator[org.apache.spark.sql.Row] = {
    val sel = if (cols.isEmpty) df else df.select(cols.map(col): _*)
    import scala.jdk.CollectionConverters._
    sel.toLocalIterator().asScala
  }
}
