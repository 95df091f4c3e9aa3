package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Records the SemDeDup production-configuration run: `dedupAuto`
  * (k = ⌈√n⌉ cells, deterministic sampled trainer — the linear-cost-law
  * configuration a 100 TB pass would use) over the embeddings table at
  * `SPARK_GRAFT_SF_DIR`, printing ONE JSON line with wall time, n, k,
  * and the kept/dropped split. The correctness side is pinned by
  * SemDedupSpec's planted-duplicate test against the same `dedupAuto`
  * entry point; this main exists to measure the configuration at
  * scale (the registered `q_dedup_semantic` uses a small fixed k so
  * its oracle stays cheap). */
object SemDedupBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val threshold = sys.env.getOrElse("SPARK_GRAFT_SEMDEDUP_T", "0.95").toDouble
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.embeddings(spark, sfDir)
    val t0 = System.nanoTime()
    val res = graft.similarity.SemDedup
      .dedupAuto(e, "vec_id", "embedding", threshold = threshold)
    val row = res.agg(count(lit(1)).as("n"),
      sum(when(col("kept"), 1L).otherwise(0L)).as("kept")).first()
    val sec = math.rint((System.nanoTime() - t0) / 1e7) / 100
    val n = row.getLong(0)
    val k = math.max(2, math.ceil(math.sqrt(n.toDouble)).toInt)
    println(s"""{"metric":"semdedup_auto","value":$sec,"unit":"sec","sf":"$sfDir",""" +
      s""""n":$n,"k":$k,"threshold":$threshold,"kept":${row.getLong(1)},""" +
      s""""dropped":${n - row.getLong(1)}}""")
    spark.stop()
  }
}
