package graft

import graft.similarity.Cosine
import org.scalatest.funsuite.AnyFunSuite

/** Embedding near-dup specs: the blocked triangular equi-join must be
  * pair-for-pair identical to a driver-side brute-force computation,
  * and the LSH-banded path must recover every planted near-dup pair
  * that the exact operator reports (the sub-quadratic scale path). */
class CosineSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  private def round4(v: Double): Double =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("blocked nearDupPairs equals driver-side brute force (every pair exactly once)") {
    val rng = new scala.util.Random(11)
    val vecs = (0L until 80L).map(i => (i, Array.fill(8)(rng.nextGaussian().toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Cosine.nearDupPairs(df, "vec_id", "embedding", 0.3, blocks = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = (for {
      (i, vi) <- vecs; (j, vj) <- vecs if i < j
      c = cosine(vi, vj) if c >= 0.3
    } yield (i, j, round4(c))).toSet
    assert(want.nonEmpty, "fixture should produce some qualifying pairs")
    assert(got == want)
  }

  test("blocked nearDupPairs emits no duplicate pairs across block boundaries") {
    val rng = new scala.util.Random(13)
    val df = (0L until 60L).map(i => (i, Array.fill(4)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val pairs = Cosine.nearDupPairs(df, "vec_id", "embedding", -1.0, blocks = 4)
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == 60 * 59 / 2) // every unordered pair once
    assert(pairs.distinct.length == pairs.length)
  }

  test("zero-norm vectors never appear as near-dups (NaN cosine guarded)") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.01f)),
      (3L, Array(0.0f, 0.0f)) // zero vector → cosine undefined
    ).toDF("vec_id", "embedding")
    val pairs = Cosine.nearDupPairs(df, "vec_id", "embedding", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L))) // no NaN pair involving 3
    val top = Cosine.topK(df, df.filter($"vec_id" === 1), "vec_id", "embedding", 5)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(!top.contains(3L))
  }

  test("nearDupPairsBounded = unbounded exact pairs restricted to probe-touching pairs") {
    // the registered q_dedup_embed shape: probes × corpus, linear in
    // the corpus; pinned against the quadratic reference operator
    val rng = new scala.util.Random(19)
    val vecs = (0L until 90L).map(i => (i, Array.fill(8)(rng.nextGaussian().toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val probes = df.filter($"vec_id" < 30)
    val got = Cosine.nearDupPairsBounded(df, probes, "vec_id", "embedding", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = Cosine.nearDupPairs(df, "vec_id", "embedding", 0.3, blocks = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = full.filter(p => p._1 < 30 || p._2 < 30)
    assert(want.nonEmpty, "fixture should produce probe-touching pairs")
    assert(got == want)
    // probe-probe pairs appear exactly once despite both orientations existing
    val ids = Cosine.nearDupPairsBounded(df, probes, "vec_id", "embedding", -1.0)
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ids.distinct.length == ids.length)
    assert(ids.length == 30 * 29 / 2 + 30 * 60)
  }

  test("lshNearDupPairs finds every planted near-dup the exact operator reports") {
    val rng = new scala.util.Random(17)
    val base = (0L until 150L).map(i => (i, Array.fill(32)(rng.nextGaussian().toFloat)))
    // 25 perturbed copies → cos ≈ 0.996 with their originals
    val dups = (0 until 25).map { i =>
      val (_, v) = base(i)
      (1000L + i, v.map(x => x + 0.05f * rng.nextGaussian().toFloat))
    }
    val df = (base ++ dups).toDF("vec_id", "embedding")
    val exact = Cosine.nearDupPairs(df, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val banded = Cosine.lshNearDupPairs(df, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.size == 25, s"expected the 25 planted pairs, got ${exact.size}")
    assert(banded == exact)
  }
}
