package graft

import graft.similarity.{Ivf, Pq}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev main: adjudicate the standing "pq_res wall grows with nprobe
  * while pq_raw stays flat" observation (recorded r17 as the bias-map
  * suspicion; persisted through the bias-column refactor r17 AND the
  * dense-ordinal refactor r18 — both structural fixes, neither moved
  * it, so the cause is elsewhere). Dumps both formatted plans at
  * nprobe=256 for a shape diff, then times raw vs residual ADC search
  * interleaved at nprobe ∈ {32, 256} (min-of-reps, same session, same
  * trained index) so the candidate-volume-dependent component is
  * isolated from the corpus-encode fixed cost.
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sfs10 tools/runjvm.sh graft.PqWallAb [reps]
  */
object PqWallAb {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sfs10")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local("graft-pq-wall-ab", cpus)
    spark.sparkContext.setLogLevel("WARN")

    val e = Tables.embeddings(spark, dir).cache()
    try {
      val n = e.count()
      val probes = e.filter(col("vec_id") < 100)
      val coarse = Pq.trainCoarse(e, "vec_id", "embedding", k = 1024, iters = 3,
        maxTrainRows = 100000L)
      val cbs = Pq.trainCodebooks(e, "vec_id", "embedding", m = 8, ksub = 256,
        iters = 3, maxTrainRows = 100000L)
      val cbsRes = Pq.trainCodebooksResidual(e, "vec_id", "embedding", coarse,
        m = 8, ksub = 256, iters = 3, maxTrainRows = 100000L)
      println(s"""{"sf":"$dir","n_corpus":$n,"trained":true}""")

      println("\n========== raw ADC plan, nprobe=256 ==========")
      Pq.topK(e, probes, "vec_id", "embedding", 10, coarse, cbs, nprobe = 256)
        .explain("formatted")
      println("\n========== residual ADC plan, nprobe=256 ==========")
      Pq.topKResidual(e, probes, "vec_id", "embedding", 10, coarse, cbsRes, nprobe = 256)
        .explain("formatted")

      def time(df: => DataFrame): Double = {
        val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
      }

      // runtime-FINAL plans (AQE may have replaced the join algo the
      // initial explain printed): execute, then dump executedPlan
      if (args.lift(1).contains("finalplans")) {
        val rawDf = Pq.topK(e, probes, "vec_id", "embedding", 10, coarse, cbs, nprobe = 256)
        rawDf.count()
        println("\n========== raw FINAL executed plan, nprobe=256 ==========")
        println(rawDf.queryExecution.executedPlan.toString.take(8000))
        val resDf = Pq.topKResidual(e, probes, "vec_id", "embedding", 10, coarse, cbsRes, nprobe = 256)
        resDf.count()
        println("\n========== residual FINAL executed plan, nprobe=256 ==========")
        println(resDf.queryExecution.executedPlan.toString.take(8000))
      }
      // interleaved same-session A-B of the posting-join strategy
      // (spark.graft.pqPostingShuffleJoin is read at plan build, so
      // toggling the session conf between plans is a true in-session
      // comparison), with the raw path as the flat comparator
      for (nprobe <- Seq(32, 256); r <- 1 to reps) {
        val raw = time(Pq.topK(e, probes, "vec_id", "embedding", 10, coarse, cbs, nprobe))
        spark.conf.set("spark.graft.pqPostingShuffleJoin", "false")
        val resB = time(Pq.topKResidual(e, probes, "vec_id", "embedding", 10, coarse, cbsRes, nprobe))
        spark.conf.set("spark.graft.pqPostingShuffleJoin", "true")
        val resS = time(Pq.topKResidual(e, probes, "vec_id", "embedding", 10, coarse, cbsRes, nprobe))
        println(f"""{"nprobe":$nprobe,"rep":$r,"raw_sec":$raw%.1f,"res_broadcast_sec":$resB%.1f,"res_shuffle_sec":$resS%.1f}""")
      }
      // ivf anchor at both ends (the flat comparator)
      for (nprobe <- Seq(32, 256)) {
        val ivf = time(Ivf.topK(e, probes, "vec_id", "embedding", 10, coarse, nprobe))
        println(f"""{"nprobe":$nprobe,"ivf_sec":$ivf%.1f}""")
      }
    } finally e.unpersist()
    spark.stop()
  }
}
