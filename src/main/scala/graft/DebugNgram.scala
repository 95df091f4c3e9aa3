package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Dev main: decompose q_dedup_ngram's sf10 cost — router decision
  * (sampled hot-vs-total meeting mass) and isolated A-B of the two
  * exact candidate paths at the registered threshold. */
object DebugNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local("graft-debug-ngram", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ngram] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val mode = args.lift(1).getOrElse("auto")
    if (mode == "premat") timed("pre-materialize shingle cache") {
      println("[ngram] rows=" + Dedup.ngramShingleCache(docs, "doc_id", "text", 3).count())
    }
    timed(s"registered auto query ($mode)") {
      Dedup.ngramJaccardPairsAuto(docs, "doc_id", "text", k = 3, threshold = 0.2).count()
    }
    Dedup.releaseCaches()
    spark.stop()
  }
}
