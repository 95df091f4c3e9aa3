package graft

import graft.similarity.{Cosine, Ivf, SemDedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup specs: within-cluster pairs must equal the exact all-pairs
  * operator restricted to co-clustered docs (the approximation IS the
  * cell boundary, nothing else), planted duplicates must resolve to
  * exactly one kept representative, and the representative must be the
  * paper's keep-low-centroid-cosine member. */
class SemDedupSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  // two well-separated lobes + planted exact duplicates in each
  private def fixture(): org.apache.spark.sql.DataFrame = {
    val rng = new scala.util.Random(7)
    val base = (0L until 60L).map { i =>
      val center = if (i % 2 == 0) 5.0f else -5.0f
      (i, Array.tabulate(8)(d => center + rng.nextGaussian().toFloat))
    }
    val copies = base.filter(_._1 % 10 == 0).map { case (i, v) => (i + 1000L, v.clone()) }
    (base ++ copies).toDF("vec_id", "embedding")
  }

  test("clusterDupPairs = exact nearDupPairs restricted to co-clustered docs") {
    val df = fixture()
    val cents = Ivf.train(df, "vec_id", "embedding", k = 4, iters = 3)
    val got = SemDedup.clusterDupPairs(df, "vec_id", "embedding", cents, 0.8)
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cluster = SemDedup.assign(df, "vec_id", "embedding", cents)
      .select("vec_id", "cluster").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = Cosine.nearDupPairs(df, "vec_id", "embedding", 0.8)
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => cluster(a) == cluster(b) }.toSet
    assert(want.nonEmpty, "fixture should produce co-clustered qualifying pairs")
    assert(got == want)
  }

  test("planted exact duplicates resolve to exactly one kept member (the lower id)") {
    val df = fixture()
    val out = SemDedup.dedup(df, "vec_id", "embedding", k = 4, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    (0L until 60L by 10L).foreach { i =>
      val (a, b) = (out(i), out(i + 1000L))
      assert(a || b, s"dup group of $i lost both members")
      assert(!(a && b), s"dup group of $i kept both members")
      // identical vectors ⇒ identical cosc ⇒ tie-break keeps the lower id
      assert(a, s"tie-break should keep $i, not ${i + 1000L}")
    }
    // non-duplicated docs all survive
    (0L until 60L).filter(_ % 10 != 0).foreach(i => assert(out(i), s"$i wrongly dropped"))
  }

  test("representative is the member with the LOWEST cosine to its centroid") {
    // one tight clump of three mutual dups at varying distance from the
    // cell center: the farthest (lowest cosc) must be the one kept
    val clump = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.01f, 0.0f, 0.0f)),
      (3L, Array(1.0f, 0.1f, 0.0f, 0.0f)), // farthest from the clump mean
      (10L, Array(-1.0f, 0.0f, 0.0f, 0.0f)),
      (11L, Array(-1.0f, 0.3f, 0.0f, 0.0f)))
    val df = clump.toDF("vec_id", "embedding")
    val cents = Ivf.train(df, "vec_id", "embedding", k = 2, iters = 4)
    val assigned = SemDedup.assign(df, "vec_id", "embedding", cents)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val out = SemDedup.dedup(df, "vec_id", "embedding", k = 2, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    val clumpIds = Set(1L, 2L, 3L)
    val clumpCosc = assigned.filter(t => clumpIds(t._1))
    assert(clumpCosc.map(_._2).distinct.length == 1, "clump must share a cell")
    val wantKept = clumpCosc.minBy(t => (t._3, t._1))._1
    assert(out(wantKept), s"expected $wantKept kept (lowest cosc)")
    assert(clumpIds.filter(_ != wantKept).forall(!out(_)), "non-representatives must drop")
  }

  test("dedupAuto (sized cells, sampled trainer) still resolves planted duplicates") {
    val df = fixture()
    val out = SemDedup.dedupAuto(df, "vec_id", "embedding", threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    (0L until 60L by 10L).foreach { i =>
      assert(out(i) ^ out(i + 1000L), s"dup group of $i not resolved to one member")
    }
    assert(out.size == 66)
  }

  test("dedup is deterministic across runs") {
    val df = fixture()
    def run() = SemDedup.dedup(df, "vec_id", "embedding", k = 4, threshold = 0.9)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSeq
    assert(run() == run())
  }
}
