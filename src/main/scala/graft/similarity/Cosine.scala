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

  /** Deterministic pseudo-random hyperplane signature: bit j of the
    * signature is the sign of Σᵢ h(seed,j,i)·vᵢ where h is xxhash64
    * scaled to [-1,1]. Vectors in the same bucket for any band are
    * near-duplicate candidates. */
  def lshSignature(vec: Column, bits: Int, seed: Int): Column = {
    val bitCols = (0 until bits).map { j =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) =>
          x * (pmod(xxhash64(lit(seed), lit(j), i), lit(2000001)).cast("double") / 1000000.0 - 1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** LSH-bucketed ANN: group corpus by signature band, local top-k per
    * probe within matching buckets. Recall < 1 by construction; the
    * candidate join is an equi-join on (band, key) so it scales. */
  def lshTopK(corpus: DataFrame, probes: DataFrame, idCol: String, vecCol: String,
              k: Int, bits: Int = 16, bands: Int = 4, seed: Int = 42): DataFrame = {
    require(bits % bands == 0)
    val bandBits = bits / bands
    val mask = (1L << bandBits) - 1
    def banded(df: DataFrame, id: String, v: String, n: String): DataFrame = {
      val sig = lshSignature(col("__vd"), bits, seed)
      withNorm(df, vecCol).withColumn("__sig", sig)
        .select((0 until bands).map(b =>
          struct(lit(b).as("band"), shiftright(col("__sig"), b * bandBits).bitwiseAND(lit(mask)).as("key"),
            col(idCol).as(id), col("__vd").as(v), col("__nrm").as(n)).as(s"s$b")): _*)
        .select(explode(array((0 until bands).map(b => col(s"s$b")): _*)).as("s"))
        .select(col("s.band"), col("s.key"), col(s"s.$id").as(id), col(s"s.$v").as(v), col(s"s.$n").as(n))
    }
    val c = banded(corpus, "neighbor_id", "v2", "n2")
    val p = banded(probes, "probe_id", "v1", "n1")
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id"))
    p.join(c, Seq("band", "key"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"), col("v1"), col("n1"), col("v2"), col("n2"))
      .distinct()
      .withColumn("cos", dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"), round(col("cos"), 4).as("cos"))
  }
}
