package graft

import graft.similarity.{Cosine, Ivf, Pq}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev main: recall@k of IVF and IVF-PQ vs the exact bounded-probe
  * baseline at PRODUCTION index parameters — the number a user needs
  * to choose between rows 55 (IVF) and 55b (IVF-PQ).
  *
  * The r15 spec pinned PQ recall only on a 40-vector fixture; plain
  * IVF had a k=1024 recall spec but PQ had no production-shape
  * equivalent. This measures both, side by side, from the SAME
  * ground truth: coarse k=1024 cells, m=8 × ksub=256 codebooks
  * (byte codes, the standard PQ config for 64-dim vectors), sampled
  * training (maxTrainRows — the 100 TB discipline), and a recall
  * curve over nprobe ∈ {32, 64, 128, 256} of 1024 lists. The gap
  * between the IVF and PQ rows at the same nprobe is the PQ
  * quantization loss in isolation (both paths see near-identical
  * candidate sets on the unit-norm embeddings).
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sf10 tools/runjvm.sh graft.RecallAb [nProbes] [k] [maxTrainRows]
  */
object RecallAb {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
    val nProbes = args.headOption.map(_.toInt).getOrElse(100)
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val maxTrain = args.lift(2).map(_.toLong).getOrElse(100000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local("graft-recall-ab", cpus)
    spark.sparkContext.setLogLevel("WARN")

    val e = Tables.embeddings(spark, dir).cache()
    try {
    val nCorpus = e.count()
    val probes = e.filter(col("vec_id") < nProbes)

    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select(col("probe_id").cast("long"), col("neighbor_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // exact ground truth once: bounded-probe brute force (the
    // q_ann_topk machinery), nProbes × nCorpus scored pairs
    val tE = System.nanoTime()
    val exact = pairs(Cosine.topK(e, probes, "vec_id", "embedding", k))
    val exactSec = (System.nanoTime() - tE) / 1e9
    println(f"""{"sf":"$dir","n_corpus":$nCorpus,"n_probes":$nProbes,"k":$k,"exact_pairs":${exact.size},"exact_sec":$exactSec%.1f}""")

    val kc = 1024 // coarse cells
    val t0 = System.nanoTime()
    val coarseIvf = Ivf.train(e, "vec_id", "embedding", k = kc, iters = 3,
      maxTrainRows = maxTrain)
    val t1 = System.nanoTime()
    val coarsePq = Pq.trainCoarse(e, "vec_id", "embedding", k = kc, iters = 3,
      maxTrainRows = maxTrain)
    val t2 = System.nanoTime()
    val cbs = Pq.trainCodebooks(e, "vec_id", "embedding", m = 8, ksub = 256,
      iters = 3, maxTrainRows = maxTrain)
    val t3 = System.nanoTime()
    // residual (IVFADC) codebooks at the SAME geometry — the r17
    // lift; raw codebooks stay measured so the raw-vs-residual gap is
    // a same-session number, not a cross-round epoch guess
    val cbsRes = Pq.trainCodebooksResidual(e, "vec_id", "embedding", coarsePq,
      m = 8, ksub = 256, iters = 3, maxTrainRows = maxTrain)
    val t4 = System.nanoTime()
    println(f"""{"train_coarse_ivf_sec":${(t1 - t0) / 1e9}%.1f,"train_coarse_pq_sec":${(t2 - t1) / 1e9}%.1f,"train_codebooks_sec":${(t3 - t2) / 1e9}%.1f,"train_codebooks_res_sec":${(t4 - t3) / 1e9}%.1f,"kc":$kc,"m":8,"ksub":256,"max_train_rows":$maxTrain}""")

    for (nprobe <- Seq(32, 64, 128, 256)) {
      val ta = System.nanoTime()
      val iv = pairs(Ivf.topK(e, probes, "vec_id", "embedding", k, coarseIvf, nprobe = nprobe))
      val ivfSec = (System.nanoTime() - ta) / 1e9
      val tb = System.nanoTime()
      val pq = pairs(Pq.topK(e, probes, "vec_id", "embedding", k, coarsePq, cbs, nprobe = nprobe))
      val pqSec = (System.nanoTime() - tb) / 1e9
      val td = System.nanoTime()
      val pqRes = pairs(Pq.topKResidual(e, probes, "vec_id", "embedding", k, coarsePq, cbsRes,
        nprobe = nprobe))
      val pqResSec = (System.nanoTime() - td) / 1e9
      // the production PQ mode: residual ADC prunes to kCand=10k,
      // exact re-scoring ranks the survivors
      val tc = System.nanoTime()
      val pqr = pairs(Pq.topKRefinedResidual(e, probes, "vec_id", "embedding", k, coarsePq,
        cbsRes, nprobe = nprobe, kCand = 10 * k))
      val pqrSec = (System.nanoTime() - tc) / 1e9
      val rIvf = (exact & iv).size.toDouble / exact.size
      val rPq = (exact & pq).size.toDouble / exact.size
      val rPqRes = (exact & pqRes).size.toDouble / exact.size
      val rPqr = (exact & pqr).size.toDouble / exact.size
      println(f"""{"nprobe":$nprobe,"ivf_recall":$rIvf%.4f,"pq_raw_recall":$rPq%.4f,"pq_res_recall":$rPqRes%.4f,"pq_res_refined_recall":$rPqr%.4f,"ivf_sec":$ivfSec%.1f,"pq_raw_sec":$pqSec%.1f,"pq_res_sec":$pqResSec%.1f,"pq_res_refined_sec":$pqrSec%.1f}""")
    }

    // recall vs candidate-pool size at fixed nprobe, residual codes:
    // where re-ranking meets the IVF ceiling, and where it stops
    // paying vs just running IVF. Extended past the r16 sweep's 100·k
    // (its sf100 curve hadn't met the ceiling yet — verdict item 6).
    for (kc2 <- Seq(10 * k, 30 * k, 100 * k, 300 * k, 1000 * k)) {
      val t = System.nanoTime()
      val pqr = pairs(Pq.topKRefinedResidual(e, probes, "vec_id", "embedding", k, coarsePq,
        cbsRes, nprobe = 256, kCand = kc2))
      val sec = (System.nanoTime() - t) / 1e9
      val r = (exact & pqr).size.toDouble / exact.size
      println(f"""{"nprobe":256,"k_cand":$kc2,"pq_res_refined_recall":$r%.4f,"pq_res_refined_sec":$sec%.1f}""")
    }
    // raw-code refined anchor at the r16 sweep's top point: the
    // same-session number the residual curve is an improvement OVER
    val tAnchor = System.nanoTime()
    val rawR = pairs(Pq.topKRefined(e, probes, "vec_id", "embedding", k, coarsePq, cbs,
      nprobe = 256, kCand = 100 * k))
    val rawRSec = (System.nanoTime() - tAnchor) / 1e9
    println(f"""{"nprobe":256,"k_cand":${100 * k},"pq_raw_refined_recall":${(exact & rawR).size.toDouble / exact.size}%.4f,"pq_raw_refined_sec":$rawRSec%.1f}""")
    } finally e.unpersist()
    spark.stop()
  }
}
