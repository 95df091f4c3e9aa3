package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity (SURVEY.md §2 #44–46): cosine over
  * Array[Float] columns, computed in double for cross-engine-stable
  * numerics. Pure column expressions (codegen), no UDFs.
  *
  * Scale shape: brute-force top-k is the *baseline* (probe side must be
  * small → broadcast); the 100 TB path is LSH bucketing
  * (random-hyperplane signatures, deterministic seed) so candidate
  * generation is an equi-join on bucket keys.
  */
object Cosine {

  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Codegen'd inner product (graft.functions.ArrayDot) — the pair-join
    * hot loop; the interpreted aggregate/zip_with formulation is kept
    * out of the O(n²) path. */
  def dot(a: Column, b: Column): Column = graft.functions.GraftFunctions.arrayDot(a, b)

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Adds `__vd` (double vector) and `__nrm` columns; precomputing the
    * norm once per vector avoids recomputing it per candidate pair. */
  def withNorm(df: DataFrame, vecCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn("__vd", toDouble(col(vecCol)))
      .withColumn("__nrm", norm(col("__vd")))
  }

  /** All pairs (id1 < id2) with cosine >= threshold. Brute-force
    * O(n²/2) pair join — correctness baseline; use `lshCandidates` to
    * key the join at scale. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val a = withNorm(df, vecCol).select(col(idCol).as("doc1"), col("__vd").as("v1"), col("__nrm").as("n1"))
    val b = withNorm(df, vecCol).select(col(idCol).as("doc2"), col("__vd").as("v2"), col("__nrm").as("n2"))
    a.join(b, col("doc1") < col("doc2"))
      .withColumn("cos", dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .filter(col("cos") >= threshold)
      .select(col("doc1"), col("doc2"), round(col("cos"), 4).as("cos"))
  }

  /** Brute-force cosine top-k: for each probe, the k nearest vectors
    * (cos desc, id asc tie-break). Probes broadcast against the corpus. */
  def topK(corpus: DataFrame, probes: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = withNorm(corpus, vecCol).select(col(idCol).as("neighbor_id"), col("__vd").as("v2"), col("__nrm").as("n2"))
    val p = broadcast(withNorm(probes, vecCol)
      .select(col(idCol).as("probe_id"), col("__vd").as("v1"), col("__nrm").as("n1")))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id"))
    p.join(c, col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"), round(col("cos"), 4).as("cos"))
  }

  /** Deterministic random hyperplanes for an LSH signature: seeded
    * driver-side RNG, shipped as literal arrays so each bit is one
    * codegen'd array_dot against the vector (the per-element hash
    * formulation ran interpreted and dominated the query). */
  def hyperplanes(dim: Int, bits: Int, seed: Int): Array[Array[Double]] = {
    val rng = new java.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rng.nextDouble() * 2 - 1))
  }

  /** Signature column: bit j = sign of plane_j · v. */
  def lshSignature(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      when(graft.functions.GraftFunctions.arrayDot(vec, typedLit(p.toSeq)) >= 0,
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed ANN: group corpus by signature band, local top-k per
    * probe within matching buckets. Recall < 1 by construction; the
    * candidate join is an equi-join on (band, key) so it scales. */
  def lshTopK(corpus: DataFrame, probes: DataFrame, idCol: String, vecCol: String,
              k: Int, bits: Int = 16, bands: Int = 4, seed: Int = 42): DataFrame = {
    require(bits % bands == 0)
    val bandBits = bits / bands
    val mask = (1L << bandBits) - 1
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    val planes = hyperplanes(dim, bits, seed)
    def banded(df: DataFrame, id: String): DataFrame = {
      graft.functions.GraftFunctions.register(df.sparkSession)
      df.withColumn("__vd", toDouble(col(vecCol)))
        .withColumn("__sig", lshSignature(col("__vd"), planes))
        .select(col(idCol).as(id), explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("__sig"), b * bandBits).bitwiseAND(lit(mask)).as("key"))): _*)).as("s"))
        .select(col(id), col("s.band"), col("s.key"))
    }
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id"))
    // band/bucket equi-join on (band,key) ids only; vectors join back
    // afterwards so array payloads aren't exploded per band or hashed
    // through distinct
    val cands = banded(probes, "probe_id")
      .join(banded(corpus, "neighbor_id"), Seq("band", "key"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select("probe_id", "neighbor_id").distinct()
    val pv = withNorm(probes, vecCol).select(col(idCol).as("probe_id"), col("__vd").as("v1"), col("__nrm").as("n1"))
    val cv = withNorm(corpus, vecCol).select(col(idCol).as("neighbor_id"), col("__vd").as("v2"), col("__nrm").as("n2"))
    cands.join(broadcast(pv), Seq("probe_id")).join(cv, Seq("neighbor_id"))
      .withColumn("cos", dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"), round(col("cos"), 4).as("cos"))
  }
}
