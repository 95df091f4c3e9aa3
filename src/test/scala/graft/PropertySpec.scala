package graft

import graft.operators.{Simplify, Spline, Stats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants for the numeric operators (raw scalacheck
  * Gens, seeded sample loop — scalatestplus bridge not in the offline
  * cache). */
class PropertySpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def forAll[A](gen: Gen[A], samples: Int = 10)(body: A => Unit): Unit = {
    var seed = Seed(42L)
    (0 until samples).foreach { _ =>
      body(gen.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B])(body: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => body(t._1, t._2))

  private val polyline: Gen[List[(Double, Double)]] = for {
    n <- Gen.choose(2, 40)
    ys <- Gen.listOfN(n, Gen.choose(-100.0, 100.0))
  } yield ys.zipWithIndex.map { case (y, i) => (i.toDouble, y) }

  test("RDP invariants: subset, endpoints kept, deviation bound") {
    forAll2(polyline, Gen.choose(0.1, 50.0)) { (pts, eps) =>
      val xs = pts.map(_._1).toArray
      val ys = pts.map(_._2).toArray
      val kept = Simplify.rdpKeepIndices(xs, ys, eps)
      assert(kept.head == 0 && kept.last == xs.length - 1)
      assert(kept.toSet.subsetOf(xs.indices.toSet))
      assert(kept.sorted.sameElements(kept))
      // every dropped point is within eps of the simplified polyline segment spanning it
      kept.sliding(2).foreach {
        case Array(a, b) =>
          for (i <- a + 1 until b) {
            val dx = xs(b) - xs(a); val dy = ys(b) - ys(a)
            val len = math.hypot(dx, dy)
            val d =
              if (len == 0) math.hypot(xs(i) - xs(a), ys(i) - ys(a))
              else math.abs(dy * xs(i) - dx * ys(i) + xs(b) * ys(a) - ys(b) * xs(a)) / len
            assert(d <= eps + 1e-9, s"point $i deviates $d > eps $eps")
          }
        case _ =>
      }
    }
  }

  test("spline passes through its knots exactly") {
    val knots: Gen[List[(Double, Double)]] = for {
      n <- Gen.choose(3, 12)
      ys <- Gen.listOfN(n, Gen.choose(-50.0, 50.0))
    } yield ys.zipWithIndex.map { case (y, i) => (i.toDouble * 2, y) }
    forAll(knots) { pts =>
      val xs = pts.map(_._1).toArray
      val ys = pts.map(_._2).toArray
      val m = Spline.secondDerivatives(xs, ys)
      xs.indices.foreach { i =>
        assert(math.abs(Spline.eval(xs, ys, m, xs(i)) - ys(i)) < 1e-9)
      }
      // natural boundary: zero curvature at the ends
      assert(m.head == 0.0 && m.last == 0.0)
    }
  }

  test("packing invariants on random corpora: chunk streams dense, bins valid") {
    import graft.pipeline.Packing
    val corpus: Gen[List[(Long, String)]] = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, Gen.choose(0, 40).map(k => List.fill(k)("w").mkString(" ")))
    } yield rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    forAll(corpus, samples = 6) { rows =>
      val df = rows.toDF("doc_id", "text")
      val budget = 16
      // chunkPack: per-shard token streams are gap-free and in doc order
      val packed = Packing.chunkPack(df, "doc_id", "text", budget, shards = 3).collect()
      packed.groupBy(_.getAs[Long]("shard")).foreach { case (_, rs) =>
        var next = 0L
        rs.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
          assert(r.getAs[Long]("tok_start") == next)
          next += r.getAs[Long]("n_tokens")
        }
      }
      // total stream length = total tokens of non-empty docs
      val totalToks = rows.map(_._2.split(" ").count(_.nonEmpty).toLong).sum
      assert(packed.map(_.getAs[Long]("n_tokens")).sum == totalToks)
      // binPack: within budget (oversize solo), every tokenful doc placed once
      val bins = Packing.binPack(df, "doc_id", "text", budget, shards = 3).collect()
      assert(bins.map(_.getAs[Long](0)).distinct.length == bins.length)
      assert(bins.length == rows.count(_._2.split(" ").exists(_.nonEmpty)))
      bins.groupBy(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin")))
        .foreach { case (_, members) =>
          if (members.exists(_.getAs[Boolean]("oversize"))) assert(members.length == 1)
          else assert(members.map(_.getAs[Long]("n_tokens")).sum <= budget)
        }
    }
  }

  test("duplicate-span invariants on random corpora: cut + spans conserve tokens") {
    // random docs over a tiny vocab (to force k-gram collisions) —
    // for EVERY doc: duplicateSpans' accounting and
    // removeDuplicateSpans' surgery must agree exactly:
    //   tokens(cut text) == n_tokens - dup_tokens == n_tokens - n_removed
    // and spans never exceed the doc
    val vocab = Vector("a", "b", "c", "d")
    val corpusGen: Gen[List[(Long, String)]] = for {
      n <- Gen.choose(5, 25)
      docs <- Gen.listOfN(n, for {
        len <- Gen.choose(1, 30)
        ws <- Gen.listOfN(len, Gen.oneOf(vocab))
      } yield ws.mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    forAll(corpusGen, samples = 5) { docs =>
      val df = docs.toDF("doc_id", "text")
      val k = 3
      val spans = graft.dedup.Dedup.duplicateSpans(df, "doc_id", "text", k = k, minCount = 2)
        .collect().map(r => r.getLong(0) ->
          (r.getAs[Long]("n_tokens"), r.getAs[Long]("dup_tokens"))).toMap
      val cut = graft.dedup.Dedup.removeDuplicateSpans(df, "doc_id", "text", k = k, minCount = 2)
        .collect().map(r => r.getLong(0) ->
          (r.getAs[String]("text"), r.getAs[Long]("n_removed"))).toMap
      docs.foreach { case (id, text) =>
        val nTokens = text.split("\\s+").count(_.nonEmpty)
        val (cleaned, nRemoved) = cut(id)
        val cleanedTokens = cleaned.split("\\s+").count(_.nonEmpty)
        spans.get(id) match {
          case Some((nt, dup)) =>
            assert(nt == nTokens, s"doc $id n_tokens $nt != $nTokens")
            assert(dup >= k && dup <= nTokens, s"doc $id dup=$dup out of [${k}, $nTokens]")
            assert(nRemoved == dup, s"doc $id n_removed $nRemoved != dup_tokens $dup")
            assert(cleanedTokens == nTokens - dup,
              s"doc $id: cleaned $cleanedTokens != $nTokens - $dup")
          case None =>
            assert(nRemoved == 0 && cleaned == text,
              s"doc $id: no spans but cut changed text")
        }
      }
    }
  }

  test("weighted quantile matches brute-force cumulative scan") {
    val data: Gen[List[(Double, Int)]] = for {
      n <- Gen.choose(5, 60)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(-1000.0, 1000.0), Gen.choose(1, 9)))
    } yield rows
    forAll(data) { rows =>
      val df = rows.toDF("v", "w")
      val qs = Seq(0.25, 0.5, 0.75)
      val got = Stats.weightedQuantile(df, "v", "w", qs)
        .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      val sorted = rows.sortBy(_._1)
      val total = rows.map(_._2).sum.toDouble
      qs.foreach { q =>
        var cum = 0.0
        val expect = sorted.find { case (_, w) => cum += w; cum >= q * total }.get._1
        val exp4 = BigDecimal(expect).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(got(q) == exp4, s"q=$q got ${got(q)} expected $exp4")
      }
    }
  }
}
