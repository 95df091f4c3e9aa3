package graft

import graft.similarity.{Ivf, Pq}
import org.apache.spark.sql.functions._

/** Dev main: search-phase A-B of IVF vs IVF-PQ over trained indexes.
  *
  * The registered q_ann_ivfpq query trains its 8 per-subspace
  * codebooks inside the query (24 full Lloyd passes over the corpus),
  * so at the 10-probe demo shape its wall is training-dominated and
  * plain IVF reads faster end-to-end (sf100: 14.4 vs 33.1 s). The
  * claim that matters at 100 TB is the SEARCH over a trained-once
  * index — candidates riding the posting-list join as m=8 ints vs 64
  * floats — so this main trains both quantizers once, then times
  * search-only at a probe-heavy shape.
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sf100 tools/runjvm.sh graft.PqAb [nProbes] [reps]
  */
object PqAb {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nProbes = args.headOption.map(_.toInt).getOrElse(2000)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local("graft-pq-ab", cpus)
    spark.sparkContext.setLogLevel("WARN")

    val e = Tables.embeddings(spark, dir)
    val probes = e.filter(col("vec_id") < nProbes)

    val t0 = System.nanoTime()
    val coarse = Ivf.train(e, "vec_id", "embedding", k = 8, iters = 3)
    val tCoarse = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val cbs = Pq.trainCodebooks(e, "vec_id", "embedding", m = 8, ksub = 16, iters = 3)
    val tCbs = (System.nanoTime() - t1) / 1e9
    println(f"""{"train_coarse_sec":$tCoarse%.1f,"train_codebooks_sec":$tCbs%.1f,"n_probes":$nProbes}""")

    // interleaved reps, count() as the action (both plans end in the
    // same window + filter, so the measured work is the candidate join
    // + scoring)
    for (r <- 1 to reps) {
      val ta = System.nanoTime()
      val nIvf = Ivf.topK(e, probes, "vec_id", "embedding", 5, coarse, nprobe = 3).count()
      val ivfSec = (System.nanoTime() - ta) / 1e9
      val tb = System.nanoTime()
      val nPq = Pq.topK(e, probes, "vec_id", "embedding", 5, coarse, cbs, nprobe = 3).count()
      val pqSec = (System.nanoTime() - tb) / 1e9
      println(f"""{"rep":$r,"ivf_search_sec":$ivfSec%.1f,"pq_search_sec":$pqSec%.1f,"ivf_rows":$nIvf,"pq_rows":$nPq}""")
    }
    spark.stop()
  }
}
