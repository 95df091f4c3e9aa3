package graft

import graft.dedup.EditDistance
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bounded edit-distance join (SURVEY.md §2 #82) pinned against the
  * brute-force all-pairs computation on planted-typo corpora: the
  * PassJoin position-aware partition scheme — fixed-position segments
  * on the indexed side, exact shift-window enumeration on the probe
  * side, per-head top-spare hot-segment DROP (no fallback route) —
  * must be LOSSLESS (same pairs, same distances as the quadratic
  * reference), including heads shorter than the fingerprint width,
  * pairs straddling length classes, boilerplate corpora that trip the
  * hot-segment suppression, short-text-majority corpora (the round-7
  * BNLJ cliff), and the drop×window composition (a planted pair whose
  * only intact segments are late AND whose early segments are dropped
  * — the class the textbook first-intact window bound silently
  * loses). */
class EditDistanceSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def bruteForce(docs: Seq[(Long, String)], maxFrac: Double,
                         headChars: Int): Set[(Long, Long, Long)] = {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = dp(i); dp(i) = cur
        }
      }
      dp(a.length)
    }
    val heads = docs.map { case (id, t) => (id, t.take(headChars)) }
    (for {
      (ia, ha) <- heads; (ib, hb) <- heads if ia < ib
      d = lev(ha, hb)
      if d <= math.floor(math.max(ha.length, hb.length) * maxFrac)
    } yield (ia, ib, d.toLong)).toSet
  }

  /** 80-char-ish heads built from a fixed alphabet soup with planted
    * near-copies at controlled edit counts, plus short and tiny docs. */
  private def corpus(): Seq[(Long, String)] = {
    val rng = new scala.util.Random(91)
    def s(n: Int) = Seq.fill(n)(('a' + rng.nextInt(26)).toChar).mkString
    val base = s(120)
    def edit(t: String, k: Int): String = {
      var cur = t
      for (_ <- 1 to k) {
        val i = rng.nextInt(cur.length)
        rng.nextInt(3) match {
          case 0 => cur = cur.updated(i, ('a' + rng.nextInt(26)).toChar) // sub
          case 1 => cur = cur.substring(0, i) + s(1) + cur.substring(i)  // ins
          case 2 => cur = cur.substring(0, i) + cur.substring(i + 1)     // del
        }
      }
      cur
    }
    Seq(
      1L -> base, 2L -> edit(base, 3), 3L -> edit(base, 8),
      4L -> edit(base, 20),          // over threshold vs base
      5L -> s(120), 6L -> s(120),    // unrelated fulls
      7L -> s(60), 8L -> s(60),      // short, unrelated
      9L -> edit(base, 1),           // 1 edit off base
      10L -> s(50), 11L -> edit("0123456789" * 5, 2).take(55),
      12L -> "0123456789" * 5,       // short near-dup family
      13L -> edit("0123456789" * 5, 4),
      14L -> s(5), 15L -> s(5),      // tiny
      16L -> base.take(76),          // short vs full straddle: 4 deletes
      17L -> s(120)
    )
  }

  test("editDistancePairs equals brute force (planted corpus)") {
    val docs = corpus()
    val df = docs.toDF("doc_id", "text")
    val got = EditDistance.editDistancePairs(df, "doc_id", "text",
        maxFrac = 0.1, headChars = 80)
      .as[(Long, Long, Long)].collect().toSet
    val want = bruteForce(docs, 0.1, 80)
    assert(got === want)
    // the corpus must actually exercise all three routes
    assert(want.exists { case (a, b, _) => a == 1L && b == 16L },
      "full/short straddle pair missing from fixture")
    assert(want.exists { case (a, b, _) => Set(a, b).subsetOf(Set(12L, 13L, 11L)) },
      "short-short pair missing from fixture")
    assert(want.exists(_._3 >= 1), "nonzero-distance pair missing from fixture")
  }

  test("hot-segment suppression: boilerplate-dominated corpus stays exact through the top-spare drop") {
    // every doc shares an identical boilerplate prefix, so EVERY
    // prefix segment of the near-dup family is hot at hotDf=2 — each
    // head drops its `spare` costliest hot segments and must lose
    // nothing (pigeonhole keeps >= spare+1 intact segments indexed).
    // skewSampleFrac=1 makes the hotness decision deterministic.
    val rng = new scala.util.Random(17)
    def s(n: Int) = Seq.fill(n)(('a' + rng.nextInt(26)).toChar).mkString
    val boiler = "thequickbrownfoxjumpsoverthelazydogagainandagain" // 48 chars
    val tail = s(32)
    def editTail(k: Int): String = // k substitutions inside the tail
      boiler + tail.zipWithIndex.map { case (c, i) => if (i < k) 'z' else c }.mkString
    val docs: Seq[(Long, String)] = Seq(
      1L -> (boiler + tail), 2L -> editTail(1), 3L -> editTail(3),
      4L -> editTail(8), 5L -> editTail(20),               // 5 over threshold
      6L -> (boiler + s(32)), 7L -> (boiler + s(32)),      // hot, unrelated tails
      8L -> (boiler + tail).take(77),                      // hot + short: 3 dels off 1
      9L -> s(80), 10L -> s(80))                           // cold fulls
    val df = docs.toDF("doc_id", "text")
    val got = EditDistance.editDistancePairs(df, "doc_id", "text",
        maxFrac = 0.1, headChars = 80, hotDf = 2, skewSampleFrac = 1.0)
      .as[(Long, Long, Long)].collect().toSet
    val want = bruteForce(docs, 0.1, 80)
    assert(got === want)
    assert(want.exists { case (a, b, _) => a == 1L && b == 8L },
      "hot short/full straddle pair missing from fixture")
    assert(want.size >= 4, s"fixture too weak: $want")
  }

  test("giant-key block split fires and preserves the exact pair set") {
    // force the block path at spec scale: blockTarget=1 + hotDf=1
    // (giant candidacy is restricted to hot keys, and the spec corpus
    // is far below the default absolute threshold) marks every
    // multi-doc key giant (B >= 2), so the (k, probeBlock) join with
    // seg-side replication replaces the plain keyed join wherever
    // keys repeat. Output must be IDENTICAL to both the default
    // (dormant) path and brute force — the block id only spreads a
    // key's candidate stream, never changes the multiset (a pair
    // meets at exactly (k, block(probe doc))). skewSampleFrac=1 makes
    // the giant-key decision deterministic.
    val docs = corpus()
    val df = docs.toDF("doc_id", "text")
    val blocked = EditDistance.editDistancePairs(df, "doc_id", "text",
        maxFrac = 0.1, headChars = 80, skewSampleFrac = 1.0, hotDf = 1,
        blockTarget = 1L)
      .as[(Long, Long, Long)].collect().toSet
    // the forced path really did split: some sampled key must carry B >= 2
    val giants = EditDistance.stages(df, "doc_id", "text",
      maxFrac = 0.1, headChars = 80, skewSampleFrac = 1.0, hotDf = 1,
      blockTarget = 1L)("giantKeys")
    assert(giants.filter(col("__B") >= 2).count() > 0, "block path never fired")
    val plain = EditDistance.editDistancePairs(df, "doc_id", "text",
        maxFrac = 0.1, headChars = 80, skewSampleFrac = 1.0)
      .as[(Long, Long, Long)].collect().toSet
    assert(blocked === plain)
    assert(blocked === bruteForce(docs, 0.1, 80))
  }

  test("flipped split (segs-heavy giant via segs-side detection) fires and stays exact") {
    // force the r14 segs-side giant route at spec scale: hotDf huge so
    // NO key is hot (giant2 candidacy requires non-hot), blockTarget=1
    // so any sampled key with a*b > 4 becomes a flipped giant (segs
    // side tags its own doc-hash block, probe side replicates per
    // block). skewSampleFrac=1 makes the decision deterministic.
    // Output must equal the dormant path and brute force — the flip
    // only re-shapes which side replicates, never the candidate
    // multiset (each segs row in one block, each probe row in all).
    val docs = corpus()
    val df = docs.toDF("doc_id", "text")
    val flipped = EditDistance.editDistancePairs(df, "doc_id", "text",
        maxFrac = 0.1, headChars = 80, skewSampleFrac = 1.0,
        hotDf = 1000000, hotFrac = 1.0, blockTarget = 1L)
      .as[(Long, Long, Long)].collect().toSet
    // the forced path really did flip: giantKeys2 must carry B >= 2
    // while the hot-anchored giantKeys stays empty
    val st = EditDistance.stages(df, "doc_id", "text",
      maxFrac = 0.1, headChars = 80, skewSampleFrac = 1.0,
      hotDf = 1000000, hotFrac = 1.0, blockTarget = 1L)
    assert(st("giantKeys").isEmpty, "hot-anchored giants should be empty here")
    assert(st("giantKeys2").filter(col("__B") >= 2).count() > 0,
      "flipped path never fired")
    val plain = EditDistance.editDistancePairs(df, "doc_id", "text",
        maxFrac = 0.1, headChars = 80, skewSampleFrac = 1.0)
      .as[(Long, Long, Long)].collect().toSet
    assert(flipped === plain)
    assert(flipped === bruteForce(docs, 0.1, 80))
  }

  test("short-text corpus (every head under the fingerprint width) stays exact") {
    // the round-7 short path broadcast-nested-looped this shape; the
    // per-length pigeonhole must handle an all-short corpus exactly
    val rng = new scala.util.Random(23)
    def s(n: Int) = Seq.fill(n)(('a' + rng.nextInt(26)).toChar).mkString
    val base = s(40)
    def edit1(t: String, i: Int) = t.updated(i % t.length, 'z')
    val docs: Seq[(Long, String)] = Seq(
      1L -> base, 2L -> edit1(base, 7), 3L -> edit1(edit1(base, 3), 11),
      4L -> s(40), 5L -> s(35), 6L -> s(30), 7L -> (s(35) + "xxxxx"),
      8L -> base.take(37), 9L -> s(12), 10L -> s(12)
    )
    val df = docs.toDF("doc_id", "text")
    val got = EditDistance.editDistancePairs(df, "doc_id", "text",
        maxFrac = 0.1, headChars = 80)
      .as[(Long, Long, Long)].collect().toSet
    val want = bruteForce(docs, 0.1, 80)
    assert(got === want)
    assert(want.exists { case (a, b, _) => a == 1L && b == 8L },
      "cross-length pair missing from fixture")
  }

  test("hot-prefix drop composes with the multi-match-aware window (late-segment-only pairs survive)") {
    // The adversarial composition the sf10 cross-check caught in round
    // 10: every head shares a 14-char boilerplate prefix, so segments
    // 1–2 (width 7 at L=80, c=11) are corpus-hot and get DROPPED by
    // the per-head top-spare rule; the planted pair then has one
    // substitution in each of segments 3..9, leaving its ONLY intact
    // non-dropped segments at i = 10, 11. The textbook first-intact
    // probe window (|Δ−s| ≤ d−i+1) is EMPTY there (d−10+1 = −1 at
    // Δ = s = 0) — composing it with the drop silently lost this pair
    // class (54% of sf10's output) while every then-existing spec
    // stayed green. The sound composed bound (d−i+1+spare) must keep
    // it. skewSampleFrac=1 makes hotness deterministic.
    val rng = new scala.util.Random(41)
    def s(n: Int) = Seq.fill(n)(('a' + rng.nextInt(26)).toChar).mkString
    val prefix = "BOILERPREFIX14" // 14 chars = segments 1–2 exactly
    val mid = s(42)   // positions 15..56 (segments 3..8)
    val tail = s(24)  // positions 57..80 (segments 9..11)
    val x = prefix + mid + tail
    // one substitution in each of segments 3..9 → dist 7, intact
    // segments exactly {1, 2, 10, 11}
    val segStarts = Seq(15, 22, 29, 36, 43, 50, 57) // 1-based starts of segs 3..9
    val y = segStarts.foldLeft(x) { (t, p) =>
      t.updated(p - 1, if (t(p - 1) == 'z') 'q' else 'z') }
    val filler = (10L until 90L).map(i => i -> (prefix + s(66)))
    val docs: Seq[(Long, String)] = Seq(1L -> x, 2L -> y) ++ filler
    val got = EditDistance.editDistancePairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", maxFrac = 0.1, headChars = 80, skewSampleFrac = 1.0)
      .as[(Long, Long, Long)].collect().toSet
    val want = bruteForce(docs, 0.1, 80)
    assert(want.contains((1L, 2L, 7L)),
      "fixture broken: planted late-segment pair not within budget")
    assert(got === want)
  }

  test("identical heads pair at distance 0 beyond the head width") {
    // texts differ only AFTER headChars — heads identical
    val df = Seq(1L -> ("x" * 100 + "tailA"), 2L -> ("x" * 100 + "tailB"))
      .toDF("doc_id", "text")
    val got = EditDistance.editDistancePairs(df, "doc_id", "text", 0.1, 80)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 0L)))
  }

  test("sf0.001 corpus matches brute force") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val df = Tables.documents(spark, sf)
    val got = EditDistance.editDistancePairs(df, "doc_id", "text", 0.1, 80)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === bruteForce(docs, 0.1, 80))
  }

  test("auto chooser: escalates extraSegs on a hot-boilerplate corpus, stays exact") {
    // every head shares a 48-char boilerplate prefix — at the default
    // rung most segments are corpus-hot, so the predicted candidate
    // volume per doc is ~the corpus size. With a tiny candPerDoc
    // budget the chooser must leave the first rung; with an unbounded
    // budget it must take the first rung (cheapest geometry). Either
    // way the output is the brute-force pair set (every rung exact).
    val rng = new scala.util.Random(29)
    def s(n: Int) = Seq.fill(n)(('a' + rng.nextInt(26)).toChar).mkString
    val boiler = "thequickbrownfoxjumpsoverthelazydogagainandagain" // 48 chars
    val docs: Seq[(Long, String)] =
      (1L to 60L).map(i => i -> (boiler + s(32))) :+
        (61L -> (boiler + s(32)))
    val df = docs.toDF("doc_id", "text")
    def rung(budget: Long) = EditDistance.chooseExtraSegs(df, "doc_id", "text",
      maxFrac = 0.1, headChars = 80, hotDf = 64, skewSampleFrac = 1.0,
      hotFrac = 0.05, hotDfCap = 256, candPerDoc = budget,
      ladder = Seq(2, 5, 8, 11))
    assert(rung(Long.MaxValue / 1000) === 2, "unbounded budget must take the first rung")
    val tight = rung(4)
    assert(tight > 2, s"tight budget must escalate past the default rung, got $tight")
    val got = EditDistance.editDistancePairsAuto(df, "doc_id", "text",
        maxFrac = 0.1, headChars = 80, skewSampleFrac = 1.0, candPerDoc = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === bruteForce(docs, 0.1, 80))
  }

  test("char-count prefilter bound: nibbleL1 <= 2 * code-point levenshtein") {
    // The fused verify refutes candidates with nibbleL1(sigA, sigB) >
    // 2 * bound BEFORE the banded DP — sound only if nibbleL1 <= 2*ed
    // for EVERY string pair. Pin that inequality through the SQL
    // (codegen) path on random pairs mixing 1/2/3/4-byte code points,
    // with edit distance computed over CODE POINTS (the unit both
    // CharCountSig and Spark's levenshtein count; a Java-char DP would
    // overcount surrogate-pair edits and weaken the assertion).
    def cpLev(a: Array[Int], b: Array[Int]): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = dp(i); dp(i) = cur
        }
      }
      dp(a.length)
    }
    val rng = new scala.util.Random(23)
    // single-code-point building blocks across UTF-8 widths
    val alph: IndexedSeq[String] =
      ("abcdefghijklmnopqrstuvwxyz0123456789".map(_.toString) ++
        "κλμνξοπρστ".map(_.toString) ++ Seq("中", "日", "本", "語") ++
        Seq(new String(Character.toChars(0x1F642)), new String(Character.toChars(0x1F680))))
    def gen(n: Int): Vector[String] = Vector.fill(n)(alph(rng.nextInt(alph.length)))
    def mutate(v: Vector[String], k: Int): Vector[String] =
      (1 to k).foldLeft(v) { (cur, _) =>
        if (cur.isEmpty) Vector(alph(rng.nextInt(alph.length)))
        else {
          val i = rng.nextInt(cur.length)
          rng.nextInt(3) match {
            case 0 => cur.updated(i, alph(rng.nextInt(alph.length)))
            case 1 => (cur.take(i) :+ alph(rng.nextInt(alph.length))) ++ cur.drop(i)
            case 2 => cur.take(i) ++ cur.drop(i + 1)
          }
        }
      }
    val pairs = (0 until 90).map { i =>
      val a = gen(1 + rng.nextInt(80))
      val b = i % 3 match {
        case 0 => a                      // identical
        case 1 => mutate(a, 1 + rng.nextInt(12))  // nearby
        case _ => gen(1 + rng.nextInt(80))        // unrelated
      }
      (a.mkString, b.mkString)
    } :+ (("", "abc")) :+ (("", ""))
    graft.functions.GraftFunctions.register(spark)
    val rows = pairs.toDF("a", "b")
      .selectExpr("a", "b", "nibble_l1(char_count_sig(a), char_count_sig(b)) AS l1")
      .collect()
    var refuting = 0
    rows.foreach { r =>
      val (a, b, l1) = (r.getString(0), r.getString(1), r.getInt(2))
      val d = cpLev(a.codePoints().toArray, b.codePoints().toArray)
      assert(l1 <= 2 * d, s"bound violated: l1=$l1 ed=$d a='$a' b='$b'")
      if (l1 > 2 * math.floor(math.max(a.length, b.length) * 0.1)) refuting += 1
    }
    // the filter must also be LIVE: unrelated pairs should mostly
    // exceed the operator's 2*floor(len*0.1) refutation threshold
    assert(refuting > rows.length / 4,
      s"prefilter refuted only $refuting of ${rows.length} — dead filter?")
  }
}
