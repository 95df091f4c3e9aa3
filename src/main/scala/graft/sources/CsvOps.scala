package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV source/sink — mirrors /root/reference/private/csv.rkt
  * (df-write/csv l.81, df-read/csv l.275 with #:na /
  * #:quoted-numbers?).
  *
  * Spark's CSV datasource is distributed (splittable reads, per-task
  * writes); these wrappers pin the reference's conventions: "" and the
  * given NA token read as null, headers on, schema inference with
  * quoted numbers honored, writes quote minimally and render null as
  * the NA token.
  */
object CsvOps {

  /** df-read/csv. `na` is the literal that reads as null (reference
    * default ""). */
  def read(spark: SparkSession, path: String, na: String = "",
           headers: Boolean = true): DataFrame =
    spark.read
      .option("header", headers.toString)
      .option("nullValue", na)
      .option("emptyValue", "")
      .option("inferSchema", "true")
      // reference #:quoted-numbers? — "123" infers numeric
      .option("unescapedQuoteHandling", "STOP_AT_CLOSING_QUOTE")
      .csv(path)

  /** df-write/csv. One file per partition at scale; coalesce(1) for the
    * reference's single-file behavior only when the result is small. */
  def write(df: DataFrame, path: String, na: String = "", singleFile: Boolean = false): Unit = {
    val d = if (singleFile) df.coalesce(1) else df
    d.write.mode("overwrite")
      .option("header", "true")
      .option("nullValue", na)
      .option("emptyValue", "\"\"")
      .csv(path)
  }
}
