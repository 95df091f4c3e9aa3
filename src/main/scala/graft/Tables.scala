package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * Parquet scans give Catalyst predicate pushdown + column pruning for
  * free — every graft query starts from these, so filters/projections
  * reach the scan (verify via `.explain`: `PushedFilters`, `ReadSchema`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Inferred parquet schema per (path, mtime, nanosAsLong) — schema
    * inference is an eager footer-reading Spark job at every
    * `spark.read.parquet` CALL, so a suite that opens the same table
    * hundreds of times pays hundreds of schema jobs (one per table
    * per query per bench iteration; at cluster scale it is a footer
    * listing pass over the table). The schema is plan METADATA, not
    * data: supplying it via `.schema(...)` skips only the inference
    * job — every query still scans the parquet itself. Keyed on the
    * nanosAsLong conf too because that flag changes what type
    * TIMESTAMP(NANOS) columns infer as (LongType vs error), and two
    * sessions in one JVM may disagree on it; keyed on the path's
    * LOCAL-FS mtime so a table REWRITTEN in-JVM with a changed schema
    * (generator mains — ScaleUp, StructuredEmbeddings — overwrite
    * their dest dirs) is re-inferred instead of silently misread
    * (r18 verdict item 7). Overwrites rewrite the directory's
    * children, which updates its mtime; a non-local path (hdfs://,
    * s3a://) stats as 0 — i.e. the pre-r19 immutable-inputs contract,
    * now documented here. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, String), org.apache.spark.sql.types.StructType]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val nanos = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    val mtime = new java.io.File(path).lastModified() // 0 for non-local paths
    val sch = schemaCache.computeIfAbsent((path, mtime, nanos),
      _ => spark.read.parquet(path).schema)
    spark.read.schema(sch).parquet(path)
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  /** Events table normalized for exact cross-engine time arithmetic:
    * the driver data has TIMESTAMP(NANOS) parquet timestamps, which
    * Spark 4 only reads via `spark.sql.legacy.parquet.nanosAsLong`
    * (→ LongType nanos). We expose:
    *   - `eps_us`: exact epoch microseconds (long) — matches DuckDB's
    *     `epoch_us(ts)` (DuckDB truncates ns→µs on parquet read);
    *   - `ts`: µs-precision TimestampType.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) under nanosAsLong: ns since epoch
        raw.withColumn("eps_us", expr("ts div 1000"))
          .withColumn("ts", timestamp_micros(col("eps_us")))
      case TimestampNTZType => // µs, isAdjustedToUTC=false: the naive
        // datetime IS the UTC instant (driver data + session are UTC) —
        // the cast re-interprets it in the session zone, no shift
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("eps_us", unix_micros(col("ts")))
      case _ =>
        raw.withColumn("eps_us", unix_micros(col("ts")))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
