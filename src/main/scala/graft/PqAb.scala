package graft

import graft.similarity.{Ivf, Pq}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.functions._

/** Dev main: search-phase A-B of IVF vs IVF-PQ over trained indexes,
  * WITH the candidate-stage byte accounting from Spark's own
  * SQLMetrics.
  *
  * Wall-clock at local[32] reads parity (BENCH_pq_ab_r15.json): with
  * probes broadcast, the posting-list join never shuffles the
  * candidate stream, so local mode under-prices PQ's smaller rows.
  * The structural claim — candidates riding as m=8 int codes vs 64
  * doubles — IS measurable without a cluster, though: the top-k
  * window repartitions the surviving candidates by probe_id, and
  * that exchange's shuffleBytesWritten / shuffleRecordsWritten (plus
  * each exchange's pre-compression dataSize) price the per-candidate
  * payload in bytes. This main reports every exchange's bytes,
  * records, and bytes/record for both paths.
  *
  * Both quantizers train on the same bounded deterministic sample
  * (train-on-sample is the production discipline; the A-B measures
  * SEARCH). The PQ path's coarse matrix comes from [[Pq.trainCoarse]]
  * (normalized space — the space Pq.topK assigns cells in); the IVF
  * path's from [[Ivf.train]] (raw space, matching Ivf.topK). On the
  * unit-norm embeddings the two matrices agree up to float→double
  * rounding, so the candidate sets stay comparable.
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sf100 tools/runjvm.sh graft.PqAb [nProbes] [reps] [maxTrainRows]
  */
object PqAb {

  /** Execute THIS DataFrame's own physical plan and return its row
    * count. `df.count()` would NOT do: it wraps df in a new aggregate
    * with its own QueryExecution, so `df.queryExecution.executedPlan`
    * (where [[exchangeMetrics]] reads SQLMetrics from) never runs and
    * every metric reads 0. toRdd materializes the very plan instance
    * the metrics hang off. */
  private def runOwnPlan(df: DataFrame): Long = df.queryExecution.toRdd.count()

  /** Walk the EXECUTED plan including AQE stages and reused
    * exchanges; metrics are only populated after an action ran. */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val next = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case r: ReusedExchangeExec    => Seq(r.child)
      case _                        => p.children
    }
    p +: next.flatMap(allNodes)
  }

  /** One JSON object per shuffle exchange in df's executed plan:
    * compressed bytes on the wire, record count, bytes/record, and
    * the pre-compression dataSize estimate. */
  private def exchangeMetrics(df: DataFrame): Seq[String] =
    allNodes(df.queryExecution.executedPlan).collect {
      case ex: ShuffleExchangeLike =>
        def m(k: String): Long = ex.metrics.get(k).map(_.value).getOrElse(-1L)
        val bytes = m("shuffleBytesWritten")
        val recs = m("shuffleRecordsWritten")
        val bpr = if (recs > 0) bytes.toDouble / recs else -1.0
        f"""{"bytes_written":$bytes,"records":$recs,"bytes_per_record":$bpr%.1f,"data_size":${m("dataSize")}}"""
    }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nProbes = args.headOption.map(_.toInt).getOrElse(2000)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val maxTrain = args.lift(2).map(_.toLong).getOrElse(100000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local("graft-pq-ab", cpus)
    spark.sparkContext.setLogLevel("WARN")

    val e = Tables.embeddings(spark, dir)
    val probes = e.filter(col("vec_id") < nProbes)

    val t0 = System.nanoTime()
    val coarseIvf = Ivf.train(e, "vec_id", "embedding", k = 8, iters = 3,
      maxTrainRows = maxTrain)
    val coarsePq = Pq.trainCoarse(e, "vec_id", "embedding", k = 8, iters = 3,
      maxTrainRows = maxTrain)
    val tCoarse = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val cbs = Pq.trainCodebooks(e, "vec_id", "embedding", m = 8, ksub = 16, iters = 3,
      maxTrainRows = maxTrain)
    val tCbs = (System.nanoTime() - t1) / 1e9
    println(f"""{"train_coarse_sec":$tCoarse%.1f,"train_codebooks_sec":$tCbs%.1f,"n_probes":$nProbes,"max_train_rows":$maxTrain}""")

    // interleaved reps, each executing the df's own plan (so rep 1's
    // SQLMetrics are readable; both plans end in the same window +
    // filter, so the measured work is the candidate join + scoring)
    for (r <- 1 to reps) {
      val ivfDf = Ivf.topK(e, probes, "vec_id", "embedding", 5, coarseIvf, nprobe = 3)
      val ta = System.nanoTime()
      val nIvf = runOwnPlan(ivfDf)
      val ivfSec = (System.nanoTime() - ta) / 1e9
      val pqDf = Pq.topK(e, probes, "vec_id", "embedding", 5, coarsePq, cbs, nprobe = 3)
      val tb = System.nanoTime()
      val nPq = runOwnPlan(pqDf)
      val pqSec = (System.nanoTime() - tb) / 1e9
      println(f"""{"rep":$r,"ivf_search_sec":$ivfSec%.1f,"pq_search_sec":$pqSec%.1f,"ivf_rows":$nIvf,"pq_rows":$nPq}""")
      if (r == 1) {
        println(s"""{"ivf_exchanges":[${exchangeMetrics(ivfDf).mkString(",")}]}""")
        println(s"""{"pq_exchanges":[${exchangeMetrics(pqDf).mkString(",")}]}""")
      }
    }

    // Candidate-payload pricing in the regime where it IS a wire
    // cost: with broadcast disabled (a probe batch too large to
    // broadcast — the production bulk-search shape), the posting join
    // shuffles the CORPUS side by cell id, and that exchange's rows
    // carry exactly the per-candidate payload — (cid, id, 64-double
    // vector) for IVF vs (cid, id, 8-int codes) for PQ. Its
    // bytes/record is the structural claim as arithmetic.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val ivfS = Ivf.topK(e, probes, "vec_id", "embedding", 5, coarseIvf, nprobe = 3)
    val ts0 = System.nanoTime()
    val nIvfS = runOwnPlan(ivfS)
    val ivfShufSec = (System.nanoTime() - ts0) / 1e9
    val pqS = Pq.topK(e, probes, "vec_id", "embedding", 5, coarsePq, cbs, nprobe = 3)
    val ts1 = System.nanoTime()
    val nPqS = runOwnPlan(pqS)
    val pqShufSec = (System.nanoTime() - ts1) / 1e9
    println(f"""{"mode":"forced_shuffle_join","ivf_search_sec":$ivfShufSec%.1f,"pq_search_sec":$pqShufSec%.1f,"ivf_rows":$nIvfS,"pq_rows":$nPqS}""")
    println(s"""{"ivf_shuffle_exchanges":[${exchangeMetrics(ivfS).mkString(",")}]}""")
    println(s"""{"pq_shuffle_exchanges":[${exchangeMetrics(pqS).mkString(",")}]}""")
    spark.stop()
  }
}
