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

  /** The vector column in the narrowest type the kernels read
    * natively: array<float>/array<double> pass through untouched
    * (ArrayDot/HyperplaneBandKeys/NearestCentroids widen per element —
    * results bit-identical to casting up front, payload HALF the bytes
    * through every pair-join shuffle for float embeddings); any other
    * element type is cast. */
  private def nativeVec(df: DataFrame, vecCol: String): Column =
    df.schema(vecCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType | org.apache.spark.sql.types.DoubleType, _) =>
        col(vecCol)
      case _ => toDouble(col(vecCol))
    }

  /** Codegen'd inner product (graft.functions.ArrayDot) — the pair-join
    * hot loop; the interpreted aggregate/zip_with formulation is kept
    * out of the O(n²) path. */
  def dot(a: Column, b: Column): Column = graft.functions.GraftFunctions.arrayDot(a, b)

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Adds `__vd` (float/double vector — kernels widen per element) and
    * `__nrm` columns; precomputing the
    * norm once per vector avoids recomputing it per candidate pair.
    * Zero-norm vectors are dropped: their cosine is 0/0 = NaN, and
    * Spark orders NaN above every number, so a single all-zero
    * embedding would otherwise pass every `cos >= threshold` filter and
    * rank first in every top-k. */
  def withNorm(df: DataFrame, vecCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    graft.Parallelism.spread(df).withColumn("__vd", nativeVec(df, vecCol))
      .withColumn("__nrm", norm(col("__vd")))
      .filter(col("__nrm") > 0)
  }

  /** All pairs (id1 < id2) with cosine >= threshold — EXACT, via a
    * blocked triangular self-join: rows hash into `blocks` buckets, a
    * tiny broadcast relation enumerates the block pairs (i ≤ j), and
    * both sides shuffle on the block-pair id, so every unordered row
    * pair meets in exactly one balanced task. All equi-joins — no
    * BroadcastNestedLoopJoin, no driver-side broadcast of the corpus —
    * and each task's volume is (n/blocks)². Exact all-pairs is
    * inherently Ω(n²) compute; this shape spreads it evenly across the
    * cluster. For genuine near-dup thresholds (≥ ~0.8) use
    * `lshNearDupPairs`, which prunes candidates sub-quadratically. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double,
                   blocks: Int = 0): DataFrame = {
    val spark = df.sparkSession
    // p(p+1)/2 block-pair tasks ≈ 2× shuffle parallelism
    val p = if (blocks > 0) blocks
      else math.max(4, math.ceil(math.sqrt(4.0 * spark.sessionState.conf.numShufflePartitions)).toInt)
    import spark.implicits._
    val blockPairs = for (i <- 0 until p; j <- i until p) yield (i * p + j, i, j)
    val leftRel = broadcast(blockPairs.map { case (pid, i, j) => (pid, i, i == j) }
      .toDF("__pid", "__b", "__same"))
    val rightRel = broadcast(blockPairs.map { case (pid, _, j) => (pid, j) }
      .toDF("__pid", "__b"))
    val base = withNorm(df, vecCol)
      .withColumn("__b", pmod(xxhash64(col(idCol)), lit(p)).cast("int"))
    val a = base.select(col(idCol).as("doc1"), col("__vd").as("v1"), col("__nrm").as("n1"), col("__b"))
      .join(leftRel, "__b")
    val b = base.select(col(idCol).as("doc2"), col("__vd").as("v2"), col("__nrm").as("n2"), col("__b"))
      .join(rightRel, "__b")
    a.join(b, Seq("__pid"))
      // same-block pairs dedup by id order; cross-block pairs meet once
      .filter(!col("__same") || (col("doc1") < col("doc2")))
      .withColumn("cos", dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .filter(col("cos") >= threshold)
      .select(least(col("doc1"), col("doc2")).as("doc1"),
        greatest(col("doc1"), col("doc2")).as("doc2"), round(col("cos"), 4).as("cos"))
  }

  /** Exact cosine near-dup pairs for a BOUNDED probe set against the
    * full corpus — the scale-legal exact baseline (SURVEY §4: exact
    * brute-force lives only behind a small probe set). Cost is
    * O(|probes|·n): the probe side broadcasts, the corpus streams
    * through ONE scan, and the cost law is linear in the corpus where
    * [[nearDupPairs]] is quadratic — at 100× the data this is 100× the
    * work, not 10,000×. Unordered pairs are canonicalized (doc1 <
    * doc2) and deduped, so a pair of two probes appears once; both
    * orientations compute bit-identical cosines (same index order, same
    * operand arithmetic), which keeps the dedup hash-stable.
    * [[nearDupPairs]] remains the unbounded exact reference for specs;
    * [[lshNearDupPairsAuto]] is the unbounded scale path. */
  def nearDupPairsBounded(corpus: DataFrame, probes: DataFrame, idCol: String,
                          vecCol: String, threshold: Double): DataFrame = {
    val c = withNorm(corpus, vecCol)
      .select(col(idCol).as("__cid"), col("__vd").as("v2"), col("__nrm").as("n2"))
    val p = broadcast(withNorm(probes, vecCol)
      .select(col(idCol).as("__pid"), col("__vd").as("v1"), col("__nrm").as("n1")))
    c.join(p, col("__pid") =!= col("__cid"))
      .withColumn("cos", dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .filter(col("cos") >= threshold)
      .select(least(col("__pid"), col("__cid")).as("doc1"),
        greatest(col("__pid"), col("__cid")).as("doc2"), round(col("cos"), 4).as("cos"))
      .dropDuplicates("doc1", "doc2")
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

  /** Deterministic random hyperplanes (seeded, executor-rederivable) —
    * see [[graft.functions.Hyperplanes]]. Kept as the public generator
    * for specs and external callers. */
  def hyperplanes(dim: Int, bits: Int, seed: Int): Array[Array[Double]] =
    graft.functions.Hyperplanes.planes(dim, bits, seed)

  /** (id, band, key) rows: the vector's hyperplane signature split into
    * per-band bucket keys — the equi-join key for all LSH candidate
    * generation. One codegen'd kernel call per row
    * ([[graft.functions.HyperplaneBandKeys]]) computes every plane dot
    * in a single primitive loop; the plane matrix is re-derived from
    * the seed on the executors, so the task binary stays small (the
    * previous per-plane `typedLit` formulation shipped ~1 MB task
    * binaries and produced enormous codegen). bands × bandBits may
    * exceed 64 total planes — more planes is how recall and bucket
    * selectivity are raised together at scale. */
  private def bandedKeys(df: DataFrame, idCol: String, outId: String, vecCol: String,
      dim: Int, bits: Int, bands: Int, seed: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    graft.Parallelism.spread(df).select(col(idCol).as(outId),
        posexplode(graft.functions.GraftFunctions.hyperplaneBandKeys(
          nativeVec(df, vecCol), dim, bits, bands, seed)).as(Seq("band", "key")))
  }

  /** LSH-banded near-dup pairs: candidates = pairs sharing ≥1 band
    * bucket (equi-join on (band, key)), then exact cosine refine on the
    * candidates only. Sub-quadratic when the threshold is a genuine
    * near-dup bar (≥ ~0.8): per-bit collision prob is 1−θ/π, so
    * multi-bit bands keep buckets small while any-of-`bands` keeps
    * recall high. Recall is probabilistic — `nearDupPairs` is the exact
    * reference (and the spec cross-check on planted near-dups).
    *
    * The banded-keys frame is built ONCE and self-joined (both join
    * sides canonicalize to the same subplan, so the (band, key)
    * shuffle is planned for exchange reuse rather than recomputing the
    * signature pass per side), and one shared `withNorm` projection
    * feeds both verify joins — at 100 TB the signature scan over the
    * fact table happens once, not twice. */
  def lshNearDupPairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double,
                      bits: Int = 64, bands: Int = 8, seed: Int = 42): DataFrame = {
    require(bits % bands == 0)
    val dim = df.select(size(col(vecCol))).first().getInt(0)
    val keyed = bandedKeys(df, idCol, "__kid", vecCol, dim, bits, bands, seed)
    val cands = keyed.select(col("__kid").as("doc1"), col("band"), col("key"))
      .join(keyed.select(col("__kid").as("doc2"), col("band"), col("key")), Seq("band", "key"))
      .filter(col("doc1") < col("doc2"))
      .select("doc1", "doc2").distinct()
    val v = withNorm(df, vecCol).select(col(idCol).as("__vid"), col("__vd"), col("__nrm"))
    cands
      .join(v.select(col("__vid").as("doc1"), col("__vd").as("v1"), col("__nrm").as("n1")), Seq("doc1"))
      .join(v.select(col("__vid").as("doc2"), col("__vd").as("v2"), col("__nrm").as("n2")), Seq("doc2"))
      .withColumn("cos", dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .filter(col("cos") >= threshold)
      .select(col("doc1"), col("doc2"), round(col("cos"), 4).as("cos"))
  }

  /** [[lshNearDupPairs]] with the bucket density chosen from the
    * corpus size — the knob that keeps the candidate join linear as
    * the data grows. With FIXED band width the expected random-pair
    * collisions are n²·bands/2^bandBits: quadratic in n (measured at
    * sf10: 12-bit bands took 428 s where the exact all-pairs path took
    * 297 s — the "sub-quadratic" path lost to its own bucket flood).
    * Setting bandBits ≈ log2(n) + 4 pins expected random candidates
    * per band to ~n/16 — linear — and the band count is then solved
    * from the recall target: miss(c) = (1 − p^bandBits)^bands with
    * p = 1 − acos(c)/π, bands chosen so miss(targetCos) ≤ missProb.
    * Wider bands + more of them = same recall at the target, far
    * fewer junk candidates. One count() job sizes the corpus. */
  def lshNearDupPairsAuto(df: DataFrame, idCol: String, vecCol: String,
                          threshold: Double, targetCos: Double = 0.99,
                          missProb: Double = 1e-6, seed: Int = 42): DataFrame = {
    val n = df.count()
    val bandBits = math.max(8, (math.log(math.max(n, 2).toDouble) / math.log(2)).ceil.toInt + 4)
    val pBit = 1.0 - math.acos(math.min(targetCos, 0.999999)) / math.Pi
    val pBand = math.pow(pBit, bandBits)
    val solved = math.max(8, math.ceil(math.log(missProb) / math.log1p(-pBand)).toInt)
    val bands = math.min(64, solved)
    if (solved > bands)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"lshNearDupPairsAuto: band count capped at $bands (recall target wants $solved); " +
          f"achieved miss at targetCos=$targetCos is ${math.pow(1 - pBand, bands)}%.2e " +
          s"instead of $missProb — raise missProb or pass bits/bands explicitly")
    lshNearDupPairs(df, idCol, vecCol, threshold, bits = bandBits * bands,
      bands = bands, seed = seed)
  }

  /** LSH-bucketed ANN: group corpus by signature band, local top-k per
    * probe within matching buckets. Recall < 1 by construction; the
    * candidate join is an equi-join on (band, key) so it scales. */
  def lshTopK(corpus: DataFrame, probes: DataFrame, idCol: String, vecCol: String,
              k: Int, bits: Int = 16, bands: Int = 4, seed: Int = 42): DataFrame = {
    require(bits % bands == 0)
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id"))
    // band/bucket equi-join on (band,key) ids only; vectors join back
    // afterwards so array payloads aren't exploded per band or hashed
    // through distinct
    val cands = bandedKeys(probes, idCol, "probe_id", vecCol, dim, bits, bands, seed)
      .join(bandedKeys(corpus, idCol, "neighbor_id", vecCol, dim, bits, bands, seed), Seq("band", "key"))
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
