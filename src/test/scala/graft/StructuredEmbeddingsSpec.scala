package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The planted-cluster generator behind the r18 ANN-chooser
  * grounding (SURVEY §2 row 55d): the structure it claims to plant
  * must actually be there, deterministically. */
class StructuredEmbeddingsSpec extends AnyFunSuite with SharedSpark {

  test("structured embeddings: unit-norm, deterministic, schema-compatible") {
    val df = StructuredEmbeddings.frame(spark, nRows = 500, nClusters = 8,
      sigma = 0.09, dim = 16).cache()
    try {
      assert(df.columns.toSeq == Seq("vec_id", "embedding", "label"))
      assert(df.count() == 500)
      // every vector is unit-norm (float rounding tolerance)
      val norms = df.select(expr(
        "sqrt(aggregate(embedding, 0.0d, (a, x) -> a + cast(x as double) * x))").as("n"))
        .collect().map(_.getDouble(0))
      assert(norms.forall(n => math.abs(n - 1.0) < 1e-4))
      // deterministic: a rebuild is value-identical (hash draws, no RNG)
      val again = StructuredEmbeddings.frame(spark, 500, 8, 0.09, 16)
      assert(df.exceptAll(again).isEmpty && again.exceptAll(df).isEmpty)
      // every planted cluster is populated under the uniform hash
      assert(df.select(countDistinct("label")).first().getLong(0) == 8)
    } finally df.unpersist()
  }

  test("structured embeddings: planted clusters separate — intra-cluster cosine far above inter") {
    val df = StructuredEmbeddings.frame(spark, nRows = 400, nClusters = 8,
      sigma = 0.09, dim = 16).cache()
    try {
      val rows = df.collect().map(r =>
        (r.getInt(2), r.getSeq[Float](1).map(_.toDouble).toArray))
      def cos(a: Array[Double], b: Array[Double]) =
        a.zip(b).map { case (x, y) => x * y }.sum // unit vectors
      val sample = rows.take(120)
      val (intra, inter) = (for {
        i <- sample.indices; j <- (i + 1) until sample.length
      } yield (sample(i)._1 == sample(j)._1, cos(sample(i)._2, sample(j)._2)))
        .partition(_._1)
      val mIntra = intra.map(_._2).sum / intra.size
      val mInter = inter.map(_._2).sum / inter.size
      // at sigma=0.09/dim=16 intra-cluster cosine ~ 1/(1+sigma^2 s^2 dim)
      // >= 0.85 while random unit vectors are ~0; require a wide margin
      assert(mIntra > 0.7, s"mean intra-cluster cosine $mIntra too low - structure not planted")
      assert(mInter < 0.3, s"mean inter-cluster cosine $mInter too high - clusters not separated")
      assert(mIntra - mInter > 0.5)
    } finally df.unpersist()
  }
}
