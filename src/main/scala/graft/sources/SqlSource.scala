package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL source — mirrors /root/reference/private/sql.rkt (df-read/sql
  * l.30: run a query, one series per result column).
  *
  * Spark's JDBC datasource already maps result columns to typed
  * DataFrame columns; the wrapper adds the reference's query-first
  * calling convention. For scale, pass a `partitionColumn` with
  * bounds so the read fans out across executors instead of one
  * connection streaming 100 TB.
  */
object SqlSource {

  /** df-read/sql: `SELECT …` pushed down as a dbtable subquery. */
  def read(spark: SparkSession, url: String, query: String,
           props: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("query", query)
    props.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  /** Partitioned variant for big tables: numPartitions parallel range
    * scans on partitionColumn ∈ [lower, upper]. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, lower: Long, upper: Long,
                      numPartitions: Int, props: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower.toString)
      .option("upperBound", upper.toString)
      .option("numPartitions", numPartitions.toString)
    props.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }
}
