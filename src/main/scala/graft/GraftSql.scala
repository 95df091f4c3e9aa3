package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-API surface: register the testdata tables as temp views so the
  * whole engine is drivable via `spark.sql(...)` — the reference's
  * query capabilities re-expressed as ANSI SQL run through the same
  * Catalyst planner as the DataFrame API (identical plans, identical
  * pushdown). graft's native kernels (array_dot, simhash64,
  * minhash_sig) are FunctionRegistry-registered and callable from SQL
  * text too.
  */
object GraftSql {

  /** Create/replace temp views for every testdata table. */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    Tables.names.foreach { n =>
      val df = if (n == "events") Tables.events(spark, dir) else Tables(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
    graft.functions.GraftFunctions.register(spark)
  }

  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(query)
  }
}
