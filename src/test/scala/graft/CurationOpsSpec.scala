package graft

import graft.pipeline.{Curation, Packing, Sampling}
import graft.text.{Collocations, HeavyHitters}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Packing, sampling, heavy hitters, collocations (SURVEY.md §2
  * #67–71). Oracle queries cover the SQL-expressible halves; these
  * specs pin the algorithmic properties the oracles can't. */
class CurationOpsSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)

  // --- chunkPack -----------------------------------------------------

  test("chunkPack: streams are dense and per-shard contiguous") {
    val packed = Packing.chunkPack(docs, "doc_id", "text", budget = 128, shards = 4)
      .collect()
    assert(packed.nonEmpty)
    packed.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
      var expectedStart = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("tok_start") == expectedStart) // no gaps, no overlap
        expectedStart += r.getAs[Long]("n_tokens")
        val first = r.getAs[Long]("seq_first")
        val last = r.getAs[Long]("seq_last")
        assert(first == r.getAs[Long]("tok_start") / 128)
        assert(last >= first)
        // a doc spans exactly the sequences its token range covers
        assert(last == (r.getAs[Long]("tok_start") + r.getAs[Long]("n_tokens") - 1) / 128)
      }
    }
  }

  test("packStream: incremental assignments equal batch chunkPack across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val all = docs.select("doc_id", "text").as[(Long, String)]
      .collect().sortBy(_._1).take(60)
    val (b1, b2) = all.splitAt(30)
    val mem = MemoryStream[(Long, String)]
    val streamDf = mem.toDF().toDF("doc_id", "text")
    val packed = Packing.packStream(streamDf, "doc_id", "text", budget = 128, shards = 4)
    val q = packed.writeStream.format("memory").queryName("pack_stream")
      .outputMode("append").start()
    try {
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq); q.processAllAvailable()
      val streamed = spark.table("pack_stream").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
          r.getAs[Long]("tok_start"), r.getAs[Long]("seq_first"), r.getAs[Long]("seq_last")))
        .toSet
      val batch = Packing.chunkPack(
          all.toSeq.toDF("doc_id", "text"), "doc_id", "text", budget = 128, shards = 4)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
          r.getAs[Long]("tok_start"), r.getAs[Long]("seq_first"), r.getAs[Long]("seq_last")))
        .toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("chunkPackByGroup: streams dense per (group, shard), curriculum order respected") {
    val packed = Packing.chunkPackByGroup(docs, "doc_id", "text", "lang",
      budget = 128, shards = 4, orderCol = Some("n_chars")).collect()
    assert(packed.nonEmpty)
    val chars = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getAs[Number]("n_chars").longValue()).toMap
    packed.groupBy(r => (r.getAs[String]("lang"), r.getAs[Long]("shard")))
      .foreach { case (_, rows) =>
        // within a (group, shard) stream: concatenation follows the
        // curriculum order (n_chars asc, id asc) with no gaps
        val sorted = rows.sortBy(r =>
          (chars(r.getAs[Long]("doc_id")), r.getAs[Long]("doc_id")))
        var expectedStart = 0L
        sorted.foreach { r =>
          assert(r.getAs[Long]("tok_start") == expectedStart)
          expectedStart += r.getAs[Long]("n_tokens")
        }
      }
    // group purity: a (group, shard, seq) cell holds one group by
    // construction — cross-check no sequence id is shared across
    // groups WITH overlapping token ranges inside one shard stream
    // (each group owns its own stream, so equal seq ids across groups
    // are distinct sequences; nothing to collide)
  }

  test("binPackByGroup: bins are group-pure, within budget, near the per-group lower bound") {
    val rows = Packing.binPackByGroup(docs, "doc_id", "text", "lang",
      budget = 300, shards = 4).collect()
    assert(rows.nonEmpty)
    val byBin = rows.groupBy(r =>
      (r.getAs[String]("group"), r.getAs[Long]("shard"), r.getAs[Long]("bin")))
    byBin.foreach { case ((g, _, _), members) =>
      assert(members.forall(_.getAs[String]("group") == g)) // purity
      val total = members.map(_.getAs[Long]("n_tokens")).sum
      if (members.exists(_.getAs[Boolean]("oversize")))
        assert(members.length == 1)
      else assert(total <= 300)
    }
    // BFD quality per (group, shard): 11/9·OPT + 1, OPT ≥ volume bound
    rows.groupBy(r => (r.getAs[String]("group"), r.getAs[Long]("shard")))
      .foreach { case (_, members) =>
        val regular = members.filterNot(_.getAs[Boolean]("oversize"))
        if (regular.nonEmpty) {
          val bins = regular.map(_.getAs[Long]("bin")).distinct.length
          val lower = math.ceil(regular.map(_.getAs[Long]("n_tokens")).sum / 300.0).toInt
          assert(bins <= math.ceil(11.0 * lower / 9.0).toInt + 1,
            s"bins=$bins lower=$lower")
        }
      }
    // every tokened doc packed exactly once, same as the ungrouped path
    val nDocs = docs.filter(size(graft.text.TextAnalysis.words(col("text"))) > 0).count()
    assert(rows.length == nDocs)
  }

  // --- binPack -------------------------------------------------------

  private def binPacked(budget: Int) =
    Packing.binPack(docs, "doc_id", "text", budget = budget, shards = 4).collect()

  test("binPack: every bin within budget, oversize docs solo") {
    val rows = binPacked(300)
    assert(rows.nonEmpty)
    val byBin = rows.groupBy(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin")))
    byBin.foreach { case (_, members) =>
      val total = members.map(_.getAs[Long]("n_tokens")).sum
      if (members.exists(_.getAs[Boolean]("oversize")))
        assert(members.length == 1) // an oversize doc never shares its bin
      else assert(total <= 300)
    }
    // every input doc with tokens is packed exactly once
    val nDocs = docs.filter(size(graft.text.TextAnalysis.words(col("text"))) > 0).count()
    assert(rows.length == nDocs)
  }

  test("binPack: best-fit-decreasing stays near the volume lower bound") {
    val rows = binPacked(300)
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (_, members) =>
      val regular = members.filterNot(_.getAs[Boolean]("oversize"))
      if (regular.nonEmpty) {
        val bins = regular.map(_.getAs[Long]("bin")).distinct.length
        val lower = math.ceil(regular.map(_.getAs[Long]("n_tokens")).sum / 300.0).toInt
        // BFD is a 11/9·OPT + 1 algorithm; OPT >= volume lower bound
        assert(bins <= math.ceil(11.0 * lower / 9.0).toInt + 1,
          s"bins=$bins lower=$lower")
      }
    }
  }

  test("binPack: output independent of input partitioning") {
    val a = Packing.binPack(docs.repartition(13), "doc_id", "text", 300, 4)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("bin"))).toMap
    val b = Packing.binPack(docs.coalesce(1), "doc_id", "text", 300, 4)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("bin"))).toMap
    assert(a == b)
  }

  test("BPE: first merge is the most frequent pair, encode reproduces training segmentation") {
    // "ab" appears 3× weighted (pair (a,b) count 5 incl. 'abab'),
    // hand-checkable merge order
    val tiny = Seq((1L, "abab abab cd"), (2L, "ab cd cd")).toDF("doc_id", "text")
    val merges = graft.text.Bpe.train(tiny, "text", numMerges = 10, minPairCount = 2)
    assert(merges.nonEmpty)
    // word table: abab:2, cd:3, ab:1 → pair counts: (a,b): 2·2+1 = 5,
    // (b,a): 2, (c,d): 3 → first merge (a,b)
    assert(merges.head == ("a", "b"))
    // second round: abab→[ab,ab]: (ab,ab): 2; cd: 3 → (c,d)
    assert(merges(1) == ("c", "d"))
    val toks = tiny.select(col("doc_id"),
        graft.text.Bpe.tokenize(col("text"), merges).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // round-trip: concatenated tokens rebuild the whitespace-free text
    assert(toks(1).mkString == "ababababcd")
    // encode matches the trained segmentation (abab fully merged iff
    // (ab,ab) ranked; cd merged)
    assert(toks(2) == Seq("ab", "cd", "cd"))
    // determinism
    assert(graft.text.Bpe.train(tiny, "text", numMerges = 10, minPairCount = 2) == merges)
  }

  test("BPE symbols are code points: non-BMP characters survive encode round-trip") {
    // an astral emoji is ONE symbol (never torn into lone surrogates
    // that would encode as '?'); unmerged symbols emit verbatim
    val emoji = new String(Character.toChars(0x1F600)) // 😀, non-BMP
    val tiny = Seq((1L, s"ab ab hi$emoji$emoji hi$emoji$emoji")).toDF("doc_id", "text")
    val merges = graft.text.Bpe.train(tiny, "text", numMerges = 10, minPairCount = 2)
    val toks = tiny.select(graft.text.Bpe.tokenize(col("text"), merges).as("t"))
      .first().getSeq[String](0)
    assert(!toks.exists(_.contains("?")), s"surrogate tear: $toks")
    assert(toks.mkString == s"abab" + s"hi$emoji$emoji" * 2)
    // the repeated word "hi😀😀" fully merges (its pairs occur twice)
    assert(toks.count(_ == s"hi$emoji$emoji") == 2)
  }

  test("byte-level BPE: every token decodes back to UTF-8, any input has zero OOV") {
    val emoji = new String(Character.toChars(0x1F600))
    val tricky = Seq((1L, s"héllo héllo wörld$emoji wörld$emoji"),
      (2L, "plain ascii plain ascii")).toDF("doc_id", "text")
    val merges = graft.text.Bpe.train(tricky, "text", numMerges = 20,
      minPairCount = 2, byteLevel = true)
    assert(merges.nonEmpty)
    val toks = tricky.select(col("doc_id"),
        graft.text.Bpe.tokenize(col("text"), merges, byteLevel = true).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // round-trip through the byte mapping: tokens may split a
    // multi-byte character (inherent to byte-level BPE), so decode
    // AFTER concatenation — the byte stream rebuilds the
    // whitespace-free text exactly, accents and emoji included, no
    // special-casing, no unknown symbol possible
    assert(graft.text.Bpe.decodeByteToken(toks(1).mkString) ==
      s"héllohéllowörld${emoji}wörld$emoji")
    assert(graft.text.Bpe.decodeByteToken(toks(2).mkString) == "plainasciiplainascii")
    // repeated words compress below their byte counts
    val byteCount = s"héllohéllowörld${emoji}wörld$emoji"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    assert(toks(1).length < byteCount)
  }

  test("q_bpe_roundtrip: every document round-trips (decode ∘ concat ∘ encode = squashed text)") {
    val rows = SparkEntry.queries("q_bpe_roundtrip")(spark, sf).collect()
    assert(rows.nonEmpty)
    val bad = rows.filterNot(_.getAs[Boolean]("roundtrip_ok"))
    assert(bad.isEmpty, s"${bad.length} docs failed round-trip: ${bad.take(3).mkString}")
  }

  test("BPE on the fixture corpus compresses vs characters and never splits across whitespace") {
    val merges = graft.text.Bpe.train(docs, "text", numMerges = 100)
    // early stop when pair mass runs out is correct — the fixture's
    // synthetic lexicon saturates below 100 merges
    assert(merges.nonEmpty && merges.size <= 100)
    val agg = docs.select(
        size(graft.text.Bpe.tokenize(col("text"), merges)).as("n_bpe"),
        size(graft.text.TextAnalysis.words(col("text"))).as("n_words"),
        length(regexp_replace(col("text"), "\\s+", "")).as("n_chars"))
      .agg(sum("n_bpe").as("b"), sum("n_words").as("w"), sum("n_chars").as("c"))
      .first()
    val (b, w, c) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
    assert(b < c, s"no compression: $b tokens vs $c chars")
    assert(b >= w, s"fewer tokens than words is impossible without cross-word merges: $b vs $w")
  }

  test("PII redaction: planted patterns counted and scrubbed exactly") {
    val df = Seq(
      (1L, "mail a.b@x.co and 10.0.0.1 call +123456789 done"),
      (2L, "no pii here just 1.2.3 and +12 short"),
      (3L, "two mails x@y.io z@w.ai and ip 255.255.255.255"),
      // dotted quad INSIDE an email domain: counted as email only —
      // counts must reconcile 1:1 with [TAG] placeholders
      (4L, "reach bob@10.1.2.3.example.com now")
    ).toDF("doc_id", "text")
    val r = graft.text.Pii.redact(df, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1).getAs[Long]("n_emails") == 1 && r(1).getAs[Long]("n_ips") == 1
      && r(1).getAs[Long]("n_phones") == 1)
    assert(r(1).getAs[String]("redacted") == "mail [EMAIL] and [IP] call [PHONE] done")
    assert(r(2).getAs[Long]("n_emails") == 0 && r(2).getAs[Long]("n_ips") == 0
      && r(2).getAs[Long]("n_phones") == 0)
    assert(r(2).getAs[String]("redacted") == "no pii here just 1.2.3 and +12 short")
    assert(r(3).getAs[Long]("n_emails") == 2 && r(3).getAs[Long]("n_ips") == 1)
    assert(r(3).getAs[String]("redacted") == "two mails [EMAIL] [EMAIL] and ip [IP]")
    assert(r(4).getAs[Long]("n_emails") == 1 && r(4).getAs[Long]("n_ips") == 0
      && r(4).getAs[Long]("n_phones") == 0)
    assert(r(4).getAs[String]("redacted") == "reach [EMAIL] now")
  }

  test("PII phone tier is all-or-nothing: over-long digit runs left for audit") {
    // ADVICE r6: without \b, +<16+ digits> redacted its first 15 digits
    // and left the tail glued to [PHONE] — partial redaction is worse
    // than none (looks scrubbed, isn't)
    val df = Seq(
      (1L, "call +12345678901234567890 maybe"),   // 20 digits: no match
      (2L, "call +123456789012345 now")           // exactly 15: full match
    ).toDF("doc_id", "text")
    val r = graft.text.Pii.redact(df, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1).getAs[Long]("n_phones") == 0)
    assert(r(1).getAs[String]("redacted") == "call +12345678901234567890 maybe")
    assert(r(2).getAs[Long]("n_phones") == 1)
    assert(r(2).getAs[String]("redacted") == "call [PHONE] now")
  }

  test("PII recall tier: planted separator phones recalled >= 95%, parity output untouched") {
    // planted-PII corpus: every common separator format the parity
    // (oracle-exact) tier deliberately skips
    val planted = Seq(
      "call (415) 255-0123 today",
      "call 415-255-0123 today",
      "call 415.255.0123 today",
      "call 415 255 0123 today",
      "call +1 415-255-0123 today",
      "call 1-415-255-0123 today",
      "call +44 20 7946 0958 today",
      "call +33 1 42 68 53 00 today",
      "call +49 30 901820 today",
      "call +123456789 today")          // parity form still covered
    val df = planted.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        graft.text.Pii.redactTextRecall(col("text")).as("scrubbed"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val recalled = out.values.count(t => t.contains("[PHONE]") && !t.exists(_.isDigit))
    assert(recalled >= (planted.size * 0.95).ceil.toInt,
      s"recall ${recalled}/${planted.size}: ${out.values.mkString(" | ")}")
    // emails/IPs still take precedence over phone-shaped digit runs inside them
    val mixed = Seq((0L, "mail user123-456-7890@x.co from 10.2.123.7 or 415-255-0123"))
      .toDF("doc_id", "text")
      .select(graft.text.Pii.redactTextRecall(col("text"))).first().getString(0)
    assert(mixed == "mail [EMAIL] from [IP] or [PHONE]", mixed)
  }

  test("mixtureByMass draw is decorrelated from hashSplit (per-operator salt)") {
    // ADVICE r6: unsalted, keep_rate 0.2 kept EXACTLY hashSplit's
    // holdoutPct=20 rows — composed pipelines correlated perfectly
    val df = (1L to 2000L).map(i => (i, "g", 10L)).toDF("doc_id", "grp", "toks")
    // mass = 20000, share 1.0, budget 4000 → keep_rate 0.2
    val kept = Sampling.mixtureByMass(df, "grp", "doc_id", "toks",
      Map("g" -> 1.0), budget = 4000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val holdout = Curation.hashSplit(df, "doc_id", holdoutPct = 20)
      .filter(col("bucket") < 20).select("doc_id").collect().map(_.getLong(0)).toSet
    // independent draws at p=q=0.2 overlap ≈ 4% of rows, not 100%
    val overlap = (kept & holdout).size.toDouble / math.max(kept.size, 1)
    assert(overlap < 0.5, s"draws still correlated: overlap=$overlap")
    assert(kept.nonEmpty && holdout.nonEmpty)
  }

  test("mixtureByMass: keep-rates follow share·budget/mass, reruns identical") {
    val df = ((1L to 10L).map(i => (i, "a", 100L)) ++
      (11L to 20L).map(i => (i, "b", 50L))).toDF("doc_id", "grp", "toks")
    val out = Sampling.mixtureByMass(df, "grp", "doc_id", "toks",
      Map("a" -> 0.5, "b" -> 0.5), budget = 1000L)
    val rows = out.collect()
    // mass_a = 1000 → rate 0.5·1000/1000 = 0.5; mass_b = 500 → capped at 1
    rows.foreach { r =>
      val expected = if (r.getAs[String]("grp") == "a") 0.5 else 1.0
      assert(r.getAs[Double]("keep_rate") == expected)
    }
    // rate-1 group survives entirely; rate-0.5 group thins
    assert(rows.count(_.getAs[String]("grp") == "b") == 10)
    val aKept = rows.filter(_.getAs[String]("grp") == "a").map(_.getAs[Long]("doc_id")).toSet
    assert(aKept.size < 10 && aKept.nonEmpty)
    // deterministic: identical rows on rerun
    val again = Sampling.mixtureByMass(df, "grp", "doc_id", "toks",
      Map("a" -> 0.5, "b" -> 0.5), budget = 1000L)
      .collect().filter(_.getAs[String]("grp") == "a").map(_.getAs[Long]("doc_id")).toSet
    assert(again == aKept)
    // unlisted groups default to share 0 → dropped
    val none = Sampling.mixtureByMass(df, "grp", "doc_id", "toks",
      Map("a" -> 1.0), budget = 1000L)
      .collect().map(_.getAs[String]("grp")).toSet
    assert(none == Set("a"))
  }

  // --- sampling ------------------------------------------------------

  test("stratified: exactly min(n, |stratum|) per stratum, stable across runs") {
    val s1 = Sampling.stratified(docs, "lang", "doc_id", 5)
    val counts = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    full.foreach { case (lang, n) =>
      assert(counts(lang) == math.min(5L, n), s"lang=$lang")
    }
    val ids1 = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.stratified(docs.repartition(7), "lang", "doc_id", 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2) // determinism under repartitioning
  }

  test("weighted: inclusion tracks weight (heavier half over-represented)") {
    // 400 rows, half weight 1, half weight 20 — an E-S sample of 80
    // should draw the vast majority from the heavy half
    val rows = (0L until 400L).map(i => (i, if (i < 200) 1.0 else 20.0))
      .toDF("id", "w")
    val picked = Sampling.weighted(rows, "id", "w", 80)
      .select("id").collect().map(_.getLong(0))
    assert(picked.length == 80)
    val heavy = picked.count(_ >= 200)
    assert(heavy > 60, s"heavy=$heavy of 80") // p(this fails by chance) ~ 0 for w-ratio 20
  }

  test("weighted: k larger than the population returns everyone") {
    val rows = (0L until 10L).map(i => (i, 1.0)).toDF("id", "w")
    assert(Sampling.weighted(rows, "id", "w", 50).count() == 10)
  }

  test("mixture: rates hold in expectation and reruns pick identical rows") {
    val mixed = Sampling.mixture(docs, "lang", "doc_id",
      Map("en" -> 0, "zh" -> 100), defaultPct = 50)
    val byLang = mixed.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byLang.contains("en")) // 0% keeps nothing
    assert(byLang("zh") == full("zh")) // 100% keeps everything
    val again = Sampling.mixture(docs.repartition(9), "lang", "doc_id",
      Map("en" -> 0, "zh" -> 100), defaultPct = 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(mixed.select("doc_id").collect().map(_.getLong(0)).toSet == again)
  }

  test("tf-idf: corpus-wide terms score zero, unique terms rank first") {
    val corpus = Seq(
      (1L, "shared shared unique1 filler"),
      (2L, "shared unique2 filler"),
      (3L, "shared unique3")).toDF("doc_id", "text")
    val top = graft.text.TfIdf.topTerms(corpus, "doc_id", "text", 2).collect()
    // "shared" is in every doc → idf = ln(1) = 0 → never rank-1 (it can
    // still fill rank 2 in a two-term doc, which is correct behavior)
    assert(!top.exists(r => r.getString(1) == "shared" && r.getAs[Int]("rn") == 1))
    val first = top.filter(_.getAs[Int]("rn") == 1)
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(first == Map(1L -> "unique1", 2L -> "unique2", 3L -> "unique3"))
  }

  // --- heavy hitters / CMS -------------------------------------------

  test("CMS estimates: never under, within eps·N over") {
    val est = HeavyHitters.withCmsEstimates(docs, "text", k = 20,
      eps = 0.001, confidence = 0.99, seed = 42).collect()
    assert(est.length == 20)
    val n = docs.select(explode(graft.text.TextAnalysis.words(col("text")))).count()
    est.foreach { r =>
      val (exact, cms) = (r.getAs[Long]("cnt"), r.getAs[Long]("cnt_cms"))
      assert(cms >= exact, s"${r.getString(0)}: CMS $cms < exact $exact")
      assert(cms <= exact + math.ceil(0.001 * n).toLong * 20, // generous slack over the w.h.p. bound
        s"${r.getString(0)}: CMS $cms vs exact $exact, N=$n")
    }
    // the oracle-facing bound-check variant: same top-k, all within
    val checked = HeavyHitters.withCmsBoundCheck(docs, "text", k = 20,
      eps = 0.001, confidence = 0.99, seed = 42).collect()
    assert(checked.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      est.map(r => (r.getString(0), r.getLong(1))).toSeq)
    assert(checked.forall(_.getAs[Boolean]("within")))
  }

  test("scalable heavy hitters equal the exact path on the corpus") {
    val a = HeavyHitters.exact(docs, "text", 20).collect().map(r => (r.getString(0), r.getLong(1)))
    val b = HeavyHitters.topKScalable(docs, "text", 20).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(a.toSeq == b.toSeq)
  }

  test("scalable heavy hitters survive m smaller than the vocabulary (Zipf stress)") {
    val rng = new scala.util.Random(5)
    // 600 docs over a 2000-word vocab with a few planted hot tokens —
    // m=64 counters per partition cannot hold the vocab, but the
    // SpaceSaving superset guarantee must still keep the true top-5
    val corpus = (0L until 600L).map { i =>
      val hot = Seq.fill(6)(s"hot${rng.nextInt(5)}")
      val cold = Seq.fill(10)(s"w${rng.nextInt(2000)}")
      (i, rng.shuffle(hot ++ cold).mkString(" "))
    }.toDF("doc_id", "text")
    val exact = HeavyHitters.exact(corpus, "text", 5).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val scalable = HeavyHitters.topKScalable(corpus, "text", 5, m = 64).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(scalable == exact)
    assert(exact.forall(_._1.startsWith("hot")))
  }

  test("exact heavy hitters ordering is (count desc, token asc)") {
    val rows = HeavyHitters.exact(docs, "text", 15).collect()
    val keys = rows.map(r => (-r.getAs[Long]("cnt"), r.getString(0))).toSeq
    assert(keys == keys.sorted)
  }

  test("bigram LM: fluent repeats score higher than shuffled word salad") {
    // corpus: one sentence pattern repeated (high P(b|a)) + one doc of
    // the same vocabulary in scrambled orders (low P(b|a))
    val fluent = (1L to 20L).map(i => (i, "the cat sat on the mat"))
    val rng = new scala.util.Random(3)
    val salad = (21L to 24L).map(i =>
      (i, rng.shuffle("the cat sat on the mat".split(" ").toSeq).mkString(" ")))
    val docs = (fluent ++ salad).toDF("doc_id", "text")
    val scores = graft.text.TextAnalysis.bigramLogProb(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("avg_logprob")).toMap
    val fluentAvg = fluent.map(f => scores(f._1)).sum / fluent.size
    val saladAvg = salad.map(s => scores(s._1)).sum / salad.size
    assert(fluentAvg > saladAvg,
      s"fluent=$fluentAvg salad=$saladAvg")
    // conditional is well-formed: every score is a log-prob <= 0
    assert(scores.values.forall(_ <= 0.0))
  }

  test("repetition signals: looped boilerplate maxes out, diverse text stays low") {
    val docs = Seq(
      (1L, Seq.fill(10)("buy now limited offer").mkString(" ")), // loop
      (2L, "one two three four five six seven eight nine ten")   // diverse
    ).toDF("doc_id", "text")
    val m = graft.text.TextAnalysis.repetitionSignals(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    val loop = m(1L); val diverse = m(2L)
    // 40-word loop of a 4-word phrase: 39 bigrams, only 4 distinct
    assert(loop.getAs[Long]("n_bigrams") == 39)
    assert(loop.getAs[Double]("dup_bigram_frac") > 0.85)
    assert(loop.getAs[Double]("dup_trigram_frac") > 0.85)
    assert(loop.getAs[Double]("top_bigram_frac") > 0.2)
    assert(diverse.getAs[Double]("dup_bigram_frac") == 0.0)
    assert(diverse.getAs[Double]("dup_trigram_frac") == 0.0)
  }

  // --- collocations --------------------------------------------------

  test("PMI: planted collocation outranks frequent-but-independent pair") {
    val rng = new scala.util.Random(7)
    val filler = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    // "hong kong" always adjacent; "the of" co-occur but independently
    val corpus = (0 until 200).map { i =>
      val noise = Seq.fill(8)(filler(rng.nextInt(filler.size)))
      val s = if (i % 2 == 0) noise.take(4) ++ Seq("hong", "kong") ++ noise.drop(4)
              else noise.take(3) ++ Seq("the") ++ noise.slice(3, 6) ++ Seq("of") ++ noise.drop(6)
      (i.toLong, s.mkString(" "))
    }.toDF("doc_id", "text")
    val top = Collocations.pmiBigrams(corpus, "text", minCount = 5, k = 5).collect()
    assert(top.nonEmpty)
    assert(top.head.getString(0) == "hong" && top.head.getString(1) == "kong")
    assert(!top.exists(r => r.getString(0) == "the" && r.getString(1) == "of"))
  }

  test("PMI: empty and one-word corpora yield empty results, not errors") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Collocations.pmiBigrams(empty, "text", 1, 5).count() == 0)
    val single = Seq((1L, "word")).toDF("doc_id", "text")
    assert(Collocations.pmiBigrams(single, "text", 1, 5).count() == 0)
  }
}
