package graft

import graft.similarity.Cosine
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev main: recall@k of the LSH-bucketed ANN (row 46,
  * [[graft.similarity.Cosine.lshTopK]]) against the same exact
  * bounded-probe ground truth RecallAb uses — the one ANN row the r17
  * chooser (SURVEY §2 row 55d) cited without a production-scale recall
  * number. Sweeps the (bits, bands) plane at fixed k: more bands =
  * more OR-chances = higher recall and more candidates; more bits per
  * band = sharper buckets = fewer candidates and lower recall.
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sf10 tools/runjvm.sh graft.LshRecallAb [nProbes] [k]
  */
object LshRecallAb {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
    val nProbes = args.headOption.map(_.toInt).getOrElse(100)
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local("graft-lsh-recall-ab", cpus)
    spark.sparkContext.setLogLevel("WARN")

    val e = Tables.embeddings(spark, dir).cache()
    try {
      val nCorpus = e.count()
      val probes = e.filter(col("vec_id") < nProbes)
      def pairs(df: DataFrame): Set[(Long, Long)] =
        df.select(col("probe_id").cast("long"), col("neighbor_id").cast("long"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val t0 = System.nanoTime()
      val exact = pairs(Cosine.topK(e, probes, "vec_id", "embedding", k))
      println(f"""{"sf":"$dir","n_corpus":$nCorpus,"n_probes":$nProbes,"k":$k,"exact_sec":${(System.nanoTime() - t0) / 1e9}%.1f}""")
      for ((bits, bands) <- Seq((16, 4), (16, 8), (24, 8), (32, 8), (32, 16), (48, 16))) {
        val t = System.nanoTime()
        val got = pairs(Cosine.lshTopK(e, probes, "vec_id", "embedding", k,
          bits = bits, bands = bands))
        val sec = (System.nanoTime() - t) / 1e9
        val r = (exact & got).size.toDouble / exact.size
        println(f"""{"bits":$bits,"bands":$bands,"bits_per_band":${bits / bands},"lsh_recall":$r%.4f,"lsh_sec":$sec%.1f}""")
      }
    } finally e.unpersist()
    spark.stop()
  }
}
