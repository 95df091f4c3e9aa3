package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main for the skew-join A-B (round-7 item 2). */
object DebugSkew {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def lineitem = Tables.lineitem(spark, dir).select(
      when(pmod(col("l_partkey"), lit(10)) =!= 0, lit(1L)).otherwise(col("l_partkey")).as("k"),
      col("l_quantity"))
    def dim = Tables.part(spark, dir).select(col("p_partkey").as("k"), col("p_type"))
    def agg(j: org.apache.spark.sql.DataFrame) =
      j.groupBy("p_type").agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy("p_type")

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[debugskew] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    for (i <- 1 to 3) {
      time(s"plain_$i")(agg(lineitem.join(dim, "k")).count())
      time(s"salted_auto_$i")(agg(SkewJoin.saltedJoinAuto(lineitem, dim, "k", factor = 8)).count())
      time(s"detect_only_$i") {
        val keyOnly = lineitem.select(col("k"))
        val sliced = spark.createDataFrame(
          keyOnly.rdd.mapPartitions(_.take(41943)), keyOnly.schema)
        sliced.groupBy("k").agg(count(lit(1))).collect()
      }
      time(s"salted_known_hot_$i") {
        val isHot = col("k") === 1L
        val payload = lineitem.columns.map(col).toIndexedSeq
        val salted = lineitem.withColumn("__salt",
          when(isHot, pmod(xxhash64(payload: _*), lit(8)).cast("int")).otherwise(lit(0)))
        val repl = dim.withColumn("__salt",
          explode(when(isHot, sequence(lit(0), lit(7))).otherwise(array(lit(0)))))
        agg(salted.join(repl, Seq("k", "__salt")).drop("__salt")).count()
      }
      time(s"salted_fused_key_$i") {
        // single-long join key: does (k, salt) -> k*8+salt restore the
        // LongHashedRelation fast path?
        val isHot = col("k") === 1L
        val payload = lineitem.columns.map(col).toIndexedSeq
        val salted = lineitem.withColumn("__kx",
          col("k") * 8 + when(isHot, pmod(xxhash64(payload: _*), lit(8))).otherwise(lit(0)))
        val repl = dim.withColumn("__s",
            explode(when(isHot, sequence(lit(0), lit(7))).otherwise(array(lit(0)))))
          .withColumn("__kx", col("k") * 8 + col("__s"))
          .drop("k", "__s")
        agg(salted.join(repl, Seq("__kx")).drop("__kx")).count()
      }
      time(s"salt_expr_only_$i") {
        val payload = lineitem.columns.map(col).toIndexedSeq
        lineitem.withColumn("__salt",
            when(col("k") === 1L, pmod(xxhash64(payload: _*), lit(8)).cast("int"))
              .otherwise(lit(0)))
          .agg(sum("__salt")).collect()
      }
    }
    println("=== salted_auto plan ===")
    agg(SkewJoin.saltedJoinAuto(lineitem, dim, "k", factor = 8)).explain("formatted")
    spark.stop()
  }
}
