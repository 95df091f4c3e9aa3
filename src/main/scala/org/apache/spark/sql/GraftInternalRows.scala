package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Bridge to the sql-private InternalRow plumbing, for the few
  * per-partition imperative passes whose cost is dominated by row
  * decode when run over `df.rdd` (boxed `Row`s: one GenericRow + one
  * box per primitive field per row). `toRdd` exposes the plan's
  * physical `InternalRow` output (zero decode — `getLong`/`getInt`
  * read primitives in place); `fromRdd` re-enters the DataFrame world
  * through `internalCreateDataFrame`, whose scan node applies its own
  * unsafe projection (so the RDD may emit REUSED mutable rows under
  * the standard valid-until-next-`next()` contract). Same narrow-
  * escape-hatch placement convention as [[GraftColumnBridge]]. */
object GraftInternalRows {
  def toRdd(df: DataFrame): RDD[InternalRow] =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.toRdd

  def fromRdd(spark: SparkSession, rdd: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)
}
