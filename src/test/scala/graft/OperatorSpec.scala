package graft

import graft.operators._
import graft.operators.FrameOps._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OperatorSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("addDerived + validOnly + countNa") {
    val df = Seq((1, Some(2.0)), (2, None), (3, Some(4.0))).toDF("id", "v")
    val d = df.addDerived("v2", col("v") * 2)
    assert(d.validOnly("v").count() == 2)
    assert(d.countNa("v").first().getLong(0) == 1)
    val na = d.countNaAll(Seq("id", "v", "v2")).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(na == Map("id" -> 0L, "v" -> 1L, "v2" -> 1L))
  }

  test("equalRange filters inclusively") {
    val df = (1 to 10).toDF("x")
    assert(df.equalRange("x", 3, 5).count() == 3)
  }

  test("isSorted detects inversions in stored order") {
    assert(Seq(1, 2, 2, 5).toDF("x").isSorted("x"))
    assert(!Seq(1, 3, 2).toDF("x").isSorted("x"))
    // NA rows are skipped, not comparison-breaking — keyed and unkeyed
    // branches agree on the non-NA subsequence
    val withNa = Seq((1, Some(5)), (1, None), (1, Some(3))).toDF("k", "x")
    assert(!withNa.isSorted("x"))
    assert(!withNa.isSorted("x", Some("k")))
  }

  test("describeNumeric computes count/mean/min/max") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val r = df.describeNumeric(Seq("x")).first()
    assert(r.getAs[Long]("cnt") == 4)
    assert(math.abs(r.getAs[Double]("mean") - 2.5) < 1e-9)
    assert(r.getAs[Double]("min") == 1.0 && r.getAs[Double]("max") == 4.0)
  }

  test("weighted statistics matches hand computation (midpoint×Δw)") {
    // samples (w, v): (0,10) (10,20) (30,40)
    // pairs: dy=15 dx=10; dy=30 dx=20 → wmean = (150+600)/30 = 25
    val df = Seq((0.0, 10.0), (10.0, 20.0), (30.0, 40.0)).toDF("w", "v")
    val r = Stats.weightedStatistics(df, None, Seq(col("w")), "v", "w").first()
    assert(r.getAs[Double]("wmean") == 25.0)
    assert(r.getAs[Double]("total_weight") == 30.0)
  }

  test("statisticsFull adds skewness/kurtosis") {
    val df = Seq(1.0, 2.0, 3.0, 4.0, 100.0).toDF("x")
    val r = Stats.statisticsFull(df, "x").first()
    assert(r.getAs[Long]("cnt") == 5)
    assert(r.getAs[Double]("skewness") > 1.0) // heavy right tail
  }

  test("quantiles: exact linear interpolation") {
    val df = (1 to 5).map(_.toDouble).toDF("x")
    val q = Stats.quantiles(df, "x", Seq(0.5)).first()
    assert(q.getAs[Double]("value") == 3.0)
  }

  test("approx quantiles honor the sketch rank-error bound against exact ranks") {
    // 10k distinct values, accuracy=1000 → guaranteed rank error
    // ≤ n/accuracy = 10; a returned cut point's true rank must sit
    // within that of the requested quantile
    val n = 10000
    val df = (1 to n).map(_.toDouble).toDF("x").repartition(8)
    val qs = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
    val rows = Stats.quantilesApprox(df, "x", qs, accuracy = 1000).collect()
    assert(rows.length == qs.length)
    rows.foreach { r =>
      val (q, v) = (r.getAs[Double]("q"), r.getAs[Double]("value"))
      val trueRank = v // values ARE 1..n, so value = its own rank
      assert(math.abs(trueRank - q * n) <= n / 1000.0 + 1,
        s"q=$q cut=$v outside rank-error bound")
    }
  }

  test("quantilesApproxChecked emits exact disc windows with within=true") {
    // n = 40000 ≥ 2·accuracy — the discretization precondition; values
    // ARE their own ranks, so the window endpoints are checkable in
    // closed form: lo = ceil((q−2ε)n), hi = ceil((q+2ε)n)
    val n = 40000
    val df = (1 to n).map(_.toDouble).toDF("x").repartition(8)
    val qs = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
    val rows = Stats.quantilesApproxChecked(df, "x", qs, accuracy = 10000)
      .orderBy("q").collect()
    assert(rows.length == qs.length)
    // expected ranks in EXACT decimal arithmetic — double math here
    // would re-introduce the very FP-at-integer-rank artifact the
    // operator's r15 fix removed ((0.01+0.0002)·40000 reads
    // 408.00000000000006 in double and ceils to 409; the true
    // ⌈p·n⌉ is 408)
    def exactCeil(p: BigDecimal): Double =
      (p * n).setScale(0, BigDecimal.RoundingMode.CEILING).toDouble
    rows.zip(qs).foreach { case (r, q) =>
      assert(r.getAs[Double]("q") == q)
      assert(r.getAs[Boolean]("within"), s"q=$q sketch cut outside its disc window")
      assert(r.getAs[Double]("lo") == exactCeil(BigDecimal(q.toString) - BigDecimal("0.0002")),
        s"q=$q lo=${r.getAs[Double]("lo")}")
      assert(r.getAs[Double]("hi") == exactCeil(BigDecimal(q.toString) + BigDecimal("0.0002")),
        s"q=$q hi=${r.getAs[Double]("hi")}")
    }
    // out-of-range probes must fail fast, not emit a clamped window
    intercept[IllegalArgumentException] {
      Stats.quantilesApproxChecked(df, "x", Seq(0.0001), accuracy = 10000)
    }
    // precondition unmet (n < 2·accuracy): within must be NULL — a
    // correct sketch can land outside the disc window there, so
    // neither true (silently unchecked) nor false (spurious failure)
    // is honest; an oracle expecting true flags the null loudly
    val tiny = (1 to 100).map(_.toDouble).toDF("x")
    val t = Stats.quantilesApproxChecked(tiny, "x", Seq(0.5), accuracy = 10000).first()
    assert(t.isNullAt(t.fieldIndex("within")),
      "within must be null when n < 2*accuracy")
  }

  test("weightedQuantile picks first value crossing cumulative weight") {
    val df = Seq((1.0, 1.0), (2.0, 1.0), (3.0, 8.0)).toDF("v", "w")
    val r = Stats.weightedQuantile(df, "v", "w", Seq(0.5)).first()
    assert(r.getAs[Double]("value") == 3.0)
  }

  test("histogram buckets, dense fill, trim, combine") {
    val df = Seq(0.5, 1.5, 1.7, 5.2).toDF("x")
    val h = Histogram.histogram(df, "x", 1.0).orderBy("bucket_start")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(h.head == (0.0, 1.0))
    assert(h(1) == (1.0, 2.0))
    assert(h.length == 6) // dense 0..5
    assert(h(3) == (3.0, 0.0))
    val trimmed = Histogram.trimOutliers(h, 0.3)
    assert(trimmed.head._1 == 1.0) // 0-bucket (25%) trimmed from the left
    val c = Histogram.combine(
      Histogram.histogram(df, "x", 1.0), Histogram.histogram(df, "x", 1.0))
    assert(c.filter(col("rank1") =!= col("rank2")).count() == 0)
  }

  test("lapSwimPrep duplicates samples at previous times and zero-fills NAs") {
    val df = Seq((1L, 10L, Some(2.0)), (1L, 20L, None), (1L, 30L, Some(4.0)))
      .toDF("k", "eps", "v")
    val prep = MeanMax.lapSwimPrep(df, "k", "eps", "v")
      .collect().map(r => (r.getLong(1), r.getDouble(2))).sorted
    // originals (NA→0) + each duplicated at the previous sample's time
    assert(prep.toSeq == Seq((10L, 0.0), (10L, 2.0), (20L, 0.0), (20L, 4.0), (30L, 4.0)))
  }

  test("meanMax finds the best window average") {
    // key 1: values 1,1,10,10 at t=0,10,20,30 — best 10s-avg = 10
    val df = Seq((1L, 0L, 1.0), (1L, 10L, 1.0), (1L, 20L, 10.0), (1L, 30L, 10.0))
      .toDF("k", "eps", "v")
    val mm = MeanMax.meanMax(df, "k", "eps", "v", Seq(10L)).first()
    assert(mm.getAs[Double]("best_avg") == 10.0)
  }

  test("meanMaxAux: aux average at the main series' best window") {
    // main best 10s window is t∈[20,30] (10,10); aux there averages 3.5
    val df = Seq((1L, 0L, 1.0, 9.0), (1L, 10L, 1.0, 9.0), (1L, 20L, 10.0, 3.0), (1L, 30L, 10.0, 4.0))
      .toDF("k", "eps", "v", "aux")
    val r = MeanMax.meanMaxAux(df, "k", "eps", "v", "aux", Seq(10L)).first()
    assert(r.getAs[Double]("best_avg") == 10.0)
    assert(r.getAs[Double]("aux_avg") == 3.5)
  }

  test("saltedJoin matches plain join results") {
    val large = (1 to 1000).map(i => (i % 3, i)).toDF("key", "v")
    val small = Seq((0, "a"), (1, "b"), (2, "c")).toDF("key", "label")
    val plain = large.join(small, "key").groupBy("label").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SkewJoin.saltedJoin(large, small, "key", factor = 4)
      .groupBy("label").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(plain == salted)
  }

  test("saltedJoinAuto matches plain join with and without a detectable hot key") {
    // 90% of rows on key 7 → hot path fires; conditional salt must not
    // change the join result
    val skewed = (1 to 5000).map(i => (if (i % 10 != 0) 7 else i % 50, i)).toDF("key", "v")
    val small = (0 until 50).map(k => (k, s"lab$k")).toDF("key", "label")
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("label").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg(skewed.join(small, "key")) ==
      agg(SkewJoin.saltedJoinAuto(skewed, small, "key", factor = 4, sampleFraction = 0.5)))
    // uniform keys → no hot key detected → plain-join passthrough
    val flat = (1 to 2000).map(i => (i % 50, i)).toDF("key", "v")
    assert(agg(flat.join(small, "key")) ==
      agg(SkewJoin.saltedJoinAuto(flat, small, "key", factor = 4, sampleFraction = 0.5)))
    // left join preserves unmatched AND genuinely-null keys through
    // the conditional salt (isin(null) = null must route to salt 0,
    // not drop the row), with payloads intact — full row-set equality
    val withNulls = skewed.unionByName(
      Seq((Option(999), 10001), (Option.empty[Int], 10002)).toDF("key", "v"))
    def rowSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (Option(r.get(r.fieldIndex("key"))),
        r.getInt(r.fieldIndex("v")),
        Option(r.get(r.fieldIndex("label"))))).toSeq.sorted(
        Ordering.by((t: (Option[Any], Int, Option[Any])) => (t._1.toString, t._2)))
    assert(rowSet(withNulls.join(small, Seq("key"), "left")) ==
      rowSet(SkewJoin.saltedJoinAuto(withNulls, small, "key", factor = 4,
        sampleFraction = 0.5, joinType = "left")))
    // right/full outers are rejected up front, not silently corrupted
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoinAuto(skewed, small, "key", joinType = "full")
    }
  }

  test("interpolatedMerge equals the broadcast range-join formulation") {
    val rng = new scala.util.Random(41)
    val base = (for (k <- 1L to 5L; i <- 0 until 30) yield
      (k, i * 10.0 + rng.nextDouble(), rng.nextDouble() * 100)).toDF("k", "t", "v")
    val probes = (for (k <- 1L to 5L; j <- 1 to 20) yield
      (k, rng.nextDouble() * 300)).toDF("k", "p")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    val merge = rows(Lookup.interpolatedMerge(base, probes, "k", "t", "v", "p"))
    val bcast = rows(Lookup.interpolated(base, probes, "k", "t", "v", "p"))
    assert(bcast.nonEmpty && merge == bcast)
    // boundary: probe exactly at the final sample returns that value
    val b2 = Seq((1L, 0.0, 10.0), (1L, 5.0, 20.0)).toDF("k", "t", "v")
    val p2 = Seq((1L, 5.0)).toDF("k", "p")
    assert(Lookup.interpolatedMerge(b2, p2, "k", "t", "v", "p").first().getDouble(2) == 20.0)
    // null sample values: the segment exists, its interp is null (no
    // bridging across the null like a dropped row would cause)
    val b3 = Seq((1L, 0.0, Some(10.0)), (1L, 4.0, Option.empty[Double]), (1L, 8.0, Some(30.0)))
      .toDF("k", "t", "v")
    val p3 = Seq((1L, 5.0), (1L, 2.0)).toDF("k", "p")
    val r3 = Lookup.interpolatedMerge(b3, p3, "k", "t", "v", "p")
      .collect().map(r => r.getDouble(1) -> (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    assert(r3(5.0) == null) // segment [4,8] has a null endpoint
    assert(r3(2.0) == null) // segment [0,4] too — never 10→30 bridged
  }

  test("salted join salt is content-derived: stable across recomputation/repartitioning") {
    // the implementation's salt formula: pmod(xxhash64(all cols), factor)
    val df = (1 to 100).map(i => (i % 3, i)).toDF("key", "v")
    val saltExpr = pmod(xxhash64(col("key"), col("v")), lit(4)).cast("int")
    val s1 = df.withColumn("s", saltExpr).collect().map(r => (r.getInt(1), r.getInt(2))).toMap
    val s2 = df.repartition(7).withColumn("s", saltExpr).collect().map(r => (r.getInt(1), r.getInt(2))).toMap
    assert(s1 == s2) // a positional salt would differ after re-splitting
  }

  test("interpolated lookup: linear between samples") {
    val base = Seq((1L, 0.0, 0.0), (1L, 10.0, 100.0)).toDF("k", "t", "v")
    val probes = Seq((1L, 2.5)).toDF("k", "p")
    val r = Lookup.interpolated(base, probes, "k", "t", "v", "p").first()
    assert(r.getAs[Double]("interp") == 25.0)
  }

  test("timeDelay picks first sample at/after ts+delay") {
    val base = Seq((1L, 0.0, 5.0, 100L), (1L, 50.0, 7.0, 101L), (1L, 70.0, 9.0, 102L))
      .toDF("k", "t", "v", "id")
    val r = Lookup.timeDelay(base, "k", "t", "v", "id", lit(60.0))
      .orderBy("id").collect()
    assert(r.head.getAs[Double]("delayed_value") == 9.0) // t=0 → first ≥60 is t=70
    assert(r.length == 1) // later samples have no match
  }

  test("AsOf merge join agrees with the pair-join timeDelay formulation") {
    val rng = new scala.util.Random(7)
    val base = (1 to 500).map { i =>
      (rng.nextInt(5).toLong, rng.nextInt(1000).toDouble, rng.nextDouble() * 100, i.toLong)
    }.toDF("k", "t", "v", "id")
    val pair = Lookup.timeDelay(base, "k", "t", "v", "id", lit(60.0))
      .select("k", "id", "delayed_value")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val merged = AsOf.forwardJoin(base, "k", "t", "v", "id", 60.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(merged == pair)
  }

  test("Fit.solve solves a known system; fits recover parameters") {
    val x = Fit.solve(Array(Array(2.0, 0.0), Array(0.0, 4.0)), Array(4.0, 8.0))
    assert(x.toSeq == Seq(2.0, 2.0))
    // exact y = 3 + 2x
    val df = (1 to 20).map(i => (i.toDouble, 3.0 + 2.0 * i)).toDF("x", "y")
    val lin = Fit.linear(df, "x", "y").first()
    assert(math.abs(lin.getAs[Double]("slope") - 2.0) < 1e-6)
    assert(math.abs(lin.getAs[Double]("intercept") - 3.0) < 1e-6)
    assert(lin.getAs[Double]("rmse") == 0.0)
    // exact y = 1 + 2x + 3x²
    val dfp = (1 to 20).map(i => (i.toDouble, 1.0 + 2.0 * i + 3.0 * i * i)).toDF("x", "y")
    val coefs = Fit.polynomial(dfp, "x", "y", 2).orderBy("degree").collect().map(_.getDouble(1))
    assert(coefs.zip(Seq(1.0, 2.0, 3.0)).forall { case (a, b) => math.abs(a - b) < 1e-4 })
    // y = 2 * x^1.5
    val dfw = (1 to 20).map(i => (i.toDouble, 2.0 * math.pow(i, 1.5))).toDF("x", "y")
    val pw = Fit.power(dfw, "x", "y").first()
    assert(math.abs(pw.getAs[Double]("a") - 2.0) < 1e-3)
    assert(math.abs(pw.getAs[Double]("b") - 1.5) < 1e-3)
  }

  test("annealing minimizes a quadratic") {
    val (best, cost) = Annealing.anneal[Double](10.0,
      x => (x - 3) * (x - 3),
      (x, t, rng) => x + (rng.nextDouble() - 0.5) * 4 * t,
      iterations = 5000)
    assert(math.abs(best - 3.0) < 0.1 && cost < 0.01)
  }

  test("generic anneal accepts uphill moves on SSE-scale costs (normalized transition)") {
    // with the raw exp(Δ/t) accept, a cost in the 1e7–1e8 range drives
    // every uphill probability to exp(-huge) = 0 and the walk is
    // silently greedy; the ncost·t normalization (annealing.rkt:39)
    // keeps the exponent scale-free. Witness: at least one accepted
    // transition must move uphill.
    def f(x: Double): Double = 1e8 * (x - 3) * (x - 3) + 1e7
    val seen = scala.collection.mutable.ArrayBuffer.empty[Double]
    val (best, _) = Annealing.anneal[Double](10.0, f,
      (x, t, rng) => { seen += x; x + (rng.nextDouble() - 0.5) * 4 * t },
      iterations = 5000)
    assert(math.abs(best - 3.0) < 0.1)
    val uphill = seen.sliding(2).count { case scala.collection.Seq(a, b) => f(b) > f(a) + 1e-9 }
    assert(uphill > 0, "walk degenerated to greedy: no uphill acceptance on SSE-scale cost")
  }

  test("annealed exp/power fits strictly improve the log-transform seed's SSE") {
    // additive noise on an exponential is the reference's documented
    // bad-fit shape (least-squares-fit.rkt: the ln-y SLR "is not very
    // good" — it over-weights small-y points); the annealing refinement
    // must strictly reduce true y-space SSE and land near the generator
    val rng = new scala.util.Random(11)
    val dfe = (0 until 60).map { i =>
      val x = i / 6.0
      (x, 2.0 * math.exp(0.6 * x) + (rng.nextDouble() - 0.5) * 40.0)
    }.filter(_._2 > 0).toDF("x", "y")
    val re = Fit.exponentialAnnealed(dfe, "x", "y", iterations = 80).first()
    assert(re.getAs[Double]("sse") < re.getAs[Double]("sse_seed"),
      s"exp: ${re.getAs[Double]("sse")} !< ${re.getAs[Double]("sse_seed")}")
    assert(math.abs(re.getAs[Double]("b") - 0.6) < 0.15)
    val dfp = (1 to 60).map { i =>
      (i.toDouble, 3.0 * math.pow(i, 1.8) + (rng.nextDouble() - 0.5) * 500.0)
    }.filter(_._2 > 0).toDF("x", "y")
    val rp = Fit.powerAnnealed(dfp, "x", "y", iterations = 80).first()
    assert(rp.getAs[Double]("sse") < rp.getAs[Double]("sse_seed"),
      s"power: ${rp.getAs[Double]("sse")} !< ${rp.getAs[Double]("sse_seed")}")
    assert(math.abs(rp.getAs[Double]("b") - 1.8) < 0.2)
  }
}
