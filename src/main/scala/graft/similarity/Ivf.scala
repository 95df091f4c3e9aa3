package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN: k-means coarse quantizer → per-centroid
  * posting lists → probe only the `nprobe` nearest lists.
  *
  * Scale shape: training runs Lloyd iterations as DataFrame jobs over
  * a (sampled) corpus — assignment is a broadcast of k·dim doubles,
  * the update is one groupBy over exploded (cluster, dim) pairs; the
  * driver only ever holds the k×dim centroid matrix. Search is an
  * equi-join corpus(cid) ⋈ probes(cid ∈ nprobe nearest) — no all-pairs
  * work anywhere. Deterministic: hash-ordered init sample, fixed
  * iteration count.
  */
object Ivf {

  private def dist2(v: Column, c: Column, vn2: Column, cn2: Column): Column =
    vn2 + cn2 - lit(2.0) * graft.functions.GraftFunctions.arrayDot(v, c)

  /** Nearest-centroid id column given literal centroids. */
  private def assign(vd: Column, vn2: Column, cents: Array[(Array[Double], Double)]): Column = {
    val scored = cents.zipWithIndex.map { case ((c, cn2), i) =>
      struct(dist2(vd, typedLit(c.toSeq), vn2, lit(cn2)).as("d"), lit(i).as("cid"))
    }
    sort_array(array(scored.toIndexedSeq: _*)).getItem(0).getField("cid")
  }

  /** Lloyd's k-means with deterministic init (xxhash64-ordered rows).
    * Returns the centroid matrix. Train on a sample at 100 TB. */
  def train(df: DataFrame, idCol: String, vecCol: String, k: Int,
            iters: Int = 5): Array[Array[Double]] = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val base = df.select(col(idCol).as("__id"), Cosine.toDouble(col(vecCol)).as("__vd"))
      .withColumn("__n2", graft.functions.GraftFunctions.arrayDot(col("__vd"), col("__vd")))
      .cache()
    var cents = base.orderBy(xxhash64(col("__id"))).limit(k)
      .select("__vd").collect().map(_.getSeq[Double](0).toArray)
    for (_ <- 1 to iters) {
      val withN2 = cents.map(c => (c, c.map(x => x * x).sum))
      val assigned = base.withColumn("__cid", assign(col("__vd"), col("__n2"), withN2))
      val sums = assigned
        .select(col("__cid"), posexplode(col("__vd")).as(Seq("__i", "__x")))
        .groupBy("__cid", "__i").agg(avg("__x").as("__m"))
        .collect()
      val next = cents.map(_.clone())
      sums.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      cents = next
    }
    base.unpersist()
    cents
  }

  /** IVF top-k search: corpus in posting lists by nearest centroid;
    * each probe scans its `nprobe` nearest lists. */
  def topK(corpus: DataFrame, probes: DataFrame, idCol: String, vecCol: String,
           k: Int, centroids: Array[Array[Double]], nprobe: Int = 2): DataFrame = {
    val withN2 = centroids.map(c => (c, c.map(x => x * x).sum))
    val c = Cosine.withNorm(corpus, vecCol)
      .withColumn("__cid", assign(col("__vd"), col("__nrm") * col("__nrm"), withN2))
      .select(col("__cid"), col(idCol).as("neighbor_id"), col("__vd").as("v2"), col("__nrm").as("n2"))
    // nprobe nearest centroids per probe
    val pBase = Cosine.withNorm(probes, vecCol)
      .select(col(idCol).as("probe_id"), col("__vd").as("v1"), col("__nrm").as("n1"))
    val scored = withN2.toSeq.zipWithIndex.map { case ((cent, cn2), i) =>
      struct(dist2(col("v1"), typedLit(cent.toSeq), col("n1") * col("n1"), lit(cn2)).as("d"),
        lit(i).as("cid"))
    }
    val p = pBase.withColumn("__cids",
        slice(sort_array(array(scored.toIndexedSeq: _*)), 1, nprobe))
      .select(col("probe_id"), col("v1"), col("n1"), explode(col("__cids.cid")).as("__cid"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id"))
    p.join(c, Seq("__cid"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos", Cosine.dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"), round(col("cos"), 4).as("cos"))
  }
}
