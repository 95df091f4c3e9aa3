package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftBloom

/** Empirical false-positive behavior of the graft-native bloom at the
  * parameters `Curation.contaminationBloom` uses — the property that
  * lets the bloom path share the exact contamination oracle.
  *
  * (Motivation, measured here before the native filter existed:
  * `spark.util.sketch.BloomFilter` floors near 1.25e-5 at a requested
  * fpp=1e-6 / n=3000 because its k probe indexes derive from a pair of
  * 32-bit Murmur halves. The 64-bit double-hashing below tracks the
  * textbook rate instead.)
  */
class BloomFpSpec extends AnyFunSuite {
  test("native bloom honors requested fpp where the 32-bit sketch floors") {
    val n = 3000
    val m = GraftBloom.optimalBits(n, 1e-6)
    val k = GraftBloom.optimalK(n, m)
    val bits = new Array[Long](((m + 63) / 64).toInt)
    val rng = new scala.util.Random(7)
    val items = Array.fill(n)(rng.nextLong())
    items.foreach(GraftBloom.insert(bits, m, k, _))
    // recall: every inserted item must be found
    assert(items.forall(GraftBloom.contains(bits, m, k, _)))
    var fp = 0
    val probes = 2000000
    var i = 0
    while (i < probes) { if (GraftBloom.contains(bits, m, k, rng.nextLong())) fp += 1; i += 1 }
    info(s"fp=$fp / $probes = ${fp.toDouble / probes}")
    // at fpp=1e-6, 2M probes expect ~2 FPs; allow generous headroom —
    // anything near the sketch's 1.25e-5 floor (25 FPs) still fails
    assert(fp <= 10, s"fp rate ${fp.toDouble / probes}")
  }
}
