package graft.operators

import scala.util.Random

/** Simulated annealing — mirrors /root/reference/annealing.rkt
  * (default-temperature l.29, default-transition l.39; `annealing`
  * with goal/neighbour/temperature/transition callbacks).
  * Driver-side optimizer over a handful of parameters (the reference
  * uses it to refine least-squares fits); the *cost function* it calls
  * can itself be a distributed aggregation.
  */
object Annealing {

  /** Classic exponential-cooling annealing loop with seeded RNG.
    * @param neighbour proposes a candidate from (current, temperature∈(0,1])
    * @param goal      cost to minimize
    */
  def anneal[S](initial: S, goal: S => Double, neighbour: (S, Double, Random) => S,
                iterations: Int = 1000, seed: Long = 42L): (S, Double) = {
    val rng = new Random(seed)
    var current = initial
    var currentCost = goal(current)
    var best = current
    var bestCost = currentCost
    for (k <- 1 to iterations) {
      val t = math.max(1e-9, 1.0 - k.toDouble / iterations)
      val cand = neighbour(current, t, rng)
      val candCost = goal(cand)
      // Metropolis exponent normalized by candidate cost MAGNITUDE,
      // matching the reference's default-transition (annealing.rkt:39
      // divides by ncost·temperature) and the Fit path: with raw
      // SSE-scale costs exp(Δ/t) underflows to 0 and the walk
      // degenerates to greedy. |candCost| (not candCost) keeps the
      // normalization meaningful for objectives that go negative —
      // a negative denominator (or a near-zero one from a sign
      // change) would flip/degenerate the acceptance.
      val accept = candCost <= currentCost ||
        rng.nextDouble() < math.exp((currentCost - candCost) /
          (math.max(math.abs(candCost), Double.MinPositiveValue) * t))
      if (accept) { current = cand; currentCost = candCost }
      if (candCost < bestCost) { best = cand; bestCost = candCost }
    }
    (best, bestCost)
  }
}
