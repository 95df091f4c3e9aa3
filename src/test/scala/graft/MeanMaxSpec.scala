package graft

import graft.operators.MeanMax
import org.scalatest.funsuite.AnyFunSuite

/** Fixture spec for the faithful get-mean-max semantics
  * (/root/reference/private/meanmax.rkt l.144-189): trapezoid slices,
  * exact-length windows with the final slice prorated, full-coverage
  * only, strict-improvement position, inverted mode. All expectations
  * hand-computed from the make-delta-series definition. */
class MeanMaxSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  // samples (0,0) (7,14) (10,2): slices 49 over [0,7), 24 over [7,10)
  private val irregular = Seq((1L, 0L, 0.0), (1L, 7L, 14.0), (1L, 10L, 2.0))

  test("partial final slice is prorated linearly in time") {
    val mm = MeanMax.meanMax(irregular.toDF("k", "eps", "v"), "k", "eps", "v", Seq(5L)).first()
    // window [0,5] ⊂ first slice: total = 49·(5/7) = 35 → avg 7.0
    assert(mm.getAs[Double]("best_avg") == 7.0)
    assert(mm.getAs[Long]("best_pos") == 0L)
  }

  test("window spanning a slice boundary sums full + boundary slices") {
    val mm = MeanMax.meanMax(irregular.toDF("k", "eps", "v"), "k", "eps", "v", Seq(10L)).first()
    // window [0,10] = 49 + 24 = 73 → avg 7.3
    assert(mm.getAs[Double]("best_avg") == 7.3)
  }

  test("partial leading windows are excluded (early spike cannot win)") {
    // spike at t∈[0,2]; discrete trailing-avg would report 100 for the
    // spike head — the reference only scores fully-covered windows
    val df = Seq((1L, 0L, 100.0), (1L, 1L, 100.0), (1L, 2L, 0.0), (1L, 30L, 0.0))
      .toDF("k", "eps", "v")
    val mm = MeanMax.meanMax(df, "k", "eps", "v", Seq(10L)).first()
    assert(mm.getAs[Double]("best_avg") == 15.0) // (100+50)/10 from pos 0
    assert(mm.getAs[Long]("best_pos") == 0L)
  }

  test("durations longer than the series span produce no row") {
    val df = Seq((1L, 0L, 100.0), (1L, 1L, 100.0), (1L, 2L, 0.0), (1L, 30L, 0.0))
      .toDF("k", "eps", "v")
    assert(MeanMax.meanMax(df, "k", "eps", "v", Seq(60L)).count() == 0)
  }

  test("inverted mode minimizes (pace-style series)") {
    val df = Seq((1L, 0L, 10.0), (1L, 10L, 2.0), (1L, 20L, 30.0)).toDF("k", "eps", "v")
    val hi = MeanMax.meanMax(df, "k", "eps", "v", Seq(10L)).first()
    assert(hi.getAs[Double]("best_avg") == 16.0 && hi.getAs[Long]("best_pos") == 10L)
    val lo = MeanMax.meanMax(df, "k", "eps", "v", Seq(10L), inverted = true).first()
    assert(lo.getAs[Double]("best_avg") == 6.0 && lo.getAs[Long]("best_pos") == 0L)
  }

  test("aux average skips NA aux slices and divides by covered time") {
    val df = Seq((1L, 0L, 1.0, Option.empty[Double]), (1L, 10L, 1.0, Some(2.0)),
      (1L, 20L, 3.0, Some(4.0))).toDF("k", "eps", "v", "aux")
    val r = MeanMax.meanMaxAux(df, "k", "eps", "v", "aux", Seq(10L)).first()
    assert(r.getAs[Double]("best_avg") == 2.0)  // best window [10,20]
    assert(r.getAs[Double]("aux_avg") == 3.0)   // (2+4)/2 over covered 10s
  }

  test("best window is found across keys; ties break to earliest position") {
    val df = Seq((1L, 0L, 5.0), (1L, 10L, 5.0), (2L, 0L, 9.0), (2L, 10L, 9.0))
      .toDF("k", "eps", "v")
    val mm = MeanMax.meanMax(df, "k", "eps", "v", Seq(10L)).first()
    assert(mm.getAs[Double]("best_avg") == 9.0 && mm.getAs[Long]("best_key") == 2L)
  }

  test("property: kernel equals a direct O(n·m) evaluation on random series") {
    // independent evaluation of the same semantics: for each start
    // sample, walk slices until the window of exactly d is covered,
    // prorating the final slice; None when the tail is uncovered
    def direct(xs: Array[Long], ys: Array[Double], d: Long): Option[(Double, Long)] = {
      var best = Option.empty[(Double, Long)]
      for (h <- 0 until xs.length - 1) {
        val target = xs(h) + d
        if (xs.last >= target) {
          var total = 0.0
          var t = h
          while (xs(t + 1) < target) {
            total += (xs(t + 1) - xs(t)) * (ys(t) + ys(t + 1)) / 2
            t += 1
          }
          val dt = (xs(t + 1) - xs(t)).toDouble
          total += (xs(t + 1) - xs(t)) * (ys(t) + ys(t + 1)) / 2 * ((target - xs(t)).toDouble / dt)
          if (best.forall(b => total / d > b._1)) best = Some((total / d, xs(h)))
        }
      }
      best
    }
    val rng = new scala.util.Random(31)
    for (trial <- 1 to 5) {
      val n = 20 + rng.nextInt(60)
      val xs = Iterator.iterate(0L)(_ + 1 + rng.nextInt(30)).take(n).toArray
      val ys = Array.fill(n)(rng.nextDouble() * 100)
      val durations = Seq(5L, 37L, 120L).filter(_ < xs.last - xs.head)
      val df = xs.indices.map(i => (1L, xs(i), ys(i))).toDF("k", "eps", "v")
      val got = MeanMax.meanMax(df, "k", "eps", "v", durations)
        .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(3))).toMap
      for (d <- durations) {
        val want = direct(xs, ys, d)
        assert(want.isDefined == got.contains(d), s"trial $trial d=$d presence")
        want.foreach { case (avg, pos) =>
          val (gavg, gpos) = got(d)
          // best_avg is rounded to 4 decimals by the operator
          assert(math.abs(gavg - avg) < 1e-4, s"trial $trial d=$d value")
          assert(gpos == pos, s"trial $trial d=$d position")
        }
      }
    }
  }

  test("defaultDurations merges growth fill with important durations, sorted") {
    val d = MeanMax.defaultDurations
    assert(d.head == 10L)
    assert(d == d.sorted && d.distinct.size == d.size)
    // every important duration below the limit is present (meanmax.rkt l.37)
    MeanMax.importantDurations.filter(_ <= 10800L).foreach(i => assert(d.contains(i)))
  }
}
