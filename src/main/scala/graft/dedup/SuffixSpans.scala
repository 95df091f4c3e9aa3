package graft.dedup

import graft.operators.GlobalOrder
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact maximal duplicate substrings via a distributed suffix
  * ordering — the actual Lee et al. '22 ExactSubstr construction
  * (suffix array + neighbor LCP), re-expressed for Spark.
  *
  * [[Dedup.duplicateSpans]] marks token ranges covered by a duplicated
  * k-gram; at token granularity and minCount=2 that coverage is exact
  * for duplicates of length ≥ k, but (a) duplicates SHORTER than k are
  * invisible at the configured shuffle width, and (b) the pipeline
  * never learns each repeat's exact extent or content — only coverage.
  * This module computes, for every token position, the EXACT length of
  * the longest repeated prefix of the suffix starting there
  * ([[repeatExtents]]), which yields byte-exact span boundaries at ANY
  * minLen ([[duplicateSpansExact]]) and the maximal repeated passages
  * themselves ([[longestPassages]]) — the duplicate-mass inventory a
  * curation pass reports.
  *
  * Construction (all relational, no driver-side corpus state):
  *  1. Prefix doubling (Manber–Myers): rank each suffix by its first
  *     baseWidth·2^h tokens (round 0 keys on the raw baseWidth-token
  *     slice — NUL-joined into one string on NUL-free corpora, else
  *     compared as array; both orders ARE shorter-prefix-first
  *     finite-suffix order), doubling h until ranks are fully
  *     distinct or the span covers every still-ambiguous suffix's
  *     remaining length (the round gate — not the longest document's
  *     length). Ranks are HEAD ranks (class head's global
  *     row index, [[GlobalOrder.withHeadRank]]) so a class of size s
  *     owns rank range [r, r+s) and refines in place: each round only
  *     the still-ambiguous classes join their pos+2^h partner and
  *     re-sort — rows carry (id, pos, rank, rank2), ~32 bytes, never
  *     token text — while singleton classes accrete into frozen
  *     checkpointed pieces (the singleton flag and the class-head
  *     rank ride the ranking sort itself, so a round is one parallel
  *     sort plus slim split materializations — zero groupBy shuffles,
  *     zero split joins). Natural text
  *     individuates almost all
  *     suffixes within a few rounds, so late rounds cost a corpus
  *     scan + a small broadcast join, not a corpus sort. Suffixes
  *     never compare across documents (a position within 2^h of its
  *     doc end ranks its missing partner as −1 = "ends here", which
  *     orders doc-final suffixes exactly like finite strings).
  *  2. Suffix-array adjacency: one [[GlobalOrder.withPrev]] boundary
  *     exchange over (rank, id, pos) pairs each suffix with its SA
  *     neighbor; a suffix's longest repeated prefix is realized at an
  *     adjacent suffix (suffixes sharing a prefix are contiguous in SA
  *     order), so only n−1 pairs ever need LCP resolution.
  *  3. Neighbor LCP: equal final ranks = identical suffixes (LCP =
  *     min remaining length, no comparison needed); unequal pairs
  *     prefilter on the 128-bit minLen-gram hashes (pairs that cannot
  *     reach minLen are dropped without touching token arrays), then
  *     resolve exactly by comparing geometrically growing token
  *     chunks — survivors after round r share ≥ minLen·2^r tokens, so
  *     rounds shrink to the true heavy-repeat mass and the per-pair
  *     mismatch position lands via one indexed array expression.
  *
  * Scale: the doubling loop is ⌈log2(max doc tokens)⌉ rounds of slim
  * shuffles; token arrays are only shuffled in the chunk rounds, whose
  * survivor set after round 0 is the actual duplicate mass (AQE
  * broadcasts the shrinking pair side). Reference comparator:
  * `Dedup.duplicateSpans` (dedup/Dedup.scala:126) — spec-pinned equal
  * at the same threshold, strictly more capable below it. */
object SuffixSpans {

  private def words(text: org.apache.spark.sql.Column) =
    graft.text.TextAnalysis.words(text)

  /** (idCol, n_tokens, pos, dup_len): for every token position whose
    * longest repeated prefix reaches `minLen`, its EXACT length.
    * A "repeat" is any other corpus position (any doc, including the
    * same one) whose suffix shares that prefix.
    *
    * The construction is memoized through [[graft.SharedFrames]]
    * (eager localCheckpoint keyed on the input plan), so several
    * consumers in one JVM — `duplicateSpansExact` and
    * `longestPassages` over the same corpus, or repeated calls — pay
    * the suffix ordering ONCE. Reuse is OPPORTUNISTIC and covering:
    * a call first looks for ANY live extents entry over the same
    * corpus built at a width ≤ its minLen and derives its result by
    * `dup_len >= minLen` — exact, because a repeat of length ≥ minLen
    * needs ≥ minLen remaining tokens on both sides, so every pair
    * realizing it already exists in the narrower-width construction's
    * suffix set. Absent a covering entry it builds at its OWN width
    * (a wider build admits more suffixes into adjacency, a far less
    * selective gram prefilter, and a bigger materialized extent
    * table — round 8 measured a forced minLen-5 build at 3× the
    * minLen-8 cost, a bad trade when the narrow consumer may never
    * run). `buildMinLen` (when in [2, minLen]) forces the wider build
    * for callers that KNOW a narrower consumer follows. Release with
    * `SharedFrames.release` after the last consumer.
    *
    * `maxRounds` bounds ONLY the chunked-LCP resolution loop (step 3);
    * the prefix-doubling loop needs no bound — it terminates by
    * construction via the pending-set round gate (span doubles every
    * round, the gate closes once span ≥ the pending set's max
    * remaining suffix length). */
  def repeatExtents(df: DataFrame, idCol: String, textCol: String,
                    minLen: Int = 8, maxRounds: Int = 48,
                    buildMinLen: Int = 0,
                    baseWidth: Int = DefaultBaseWidth,
                    arity: Int = DefaultArity): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    require(baseWidth >= 1, s"baseWidth must be >= 1, got $baseWidth")
    require(arity >= 2 && arity <= 8, s"arity must be in [2, 8], got $arity")
    // baseWidth is a COST knob only (identical output at any width —
    // the base ranking orders suffixes by their first `baseWidth`
    // tokens instead of 1, so the doubling loop starts at span
    // baseWidth and skips log2(baseWidth) full-corpus rounds); it is
    // deliberately NOT part of the SharedFrames key.
    val covering = graft.SharedFrames.lookup("sa_extents", Seq(df)) {
      case Seq(i, t, b: Int, m) => i == idCol && t == textCol &&
        m == maxRounds && b <= minLen
      case _ => false
    }
    covering match {
      case Some((Seq(_, _, b: Int, _), ext)) =>
        if (minLen > b) ext.filter(col("dup_len") >= minLen) else ext
      case _ =>
        val build = if (buildMinLen >= 2 && buildMinLen <= minLen) buildMinLen else minLen
        val ext = graft.SharedFrames.getOrCompute("sa_extents", Seq(df),
          Seq(idCol, textCol, build, maxRounds)) {
          computeExtents(df, idCol, textCol, build, maxRounds, baseWidth, arity)
        }
        if (minLen > build) ext.filter(col("dup_len") >= minLen) else ext
    }
  }

  /** Refinement-round fan-out (like [[DefaultBaseWidth]], a pure cost
    * knob — identical output at any arity, spec-pinned): each round
    * combines the ranks at pos + j·span for j = 1..arity−1 into one
    * refinement sort, multiplying span by `arity` — the Larsson–Sadakane
    * doubling generalized to k-ary. Arity 4 runs half the range-sorts
    * of arity 2 at ~2 extra longs per sort row, but pays (arity−1)
    * partner lookup joins per round instead of 1 — each rescanning the
    * full rank view (frozen ∪ pending ≈ n rows). Measured-and-REJECTED
    * as the sf10 default (BENCH_sa_ladder_ab_r13.json, 3 interleaved
    * fresh-JVM reps: family medians 240.3 s at arity 4 vs 172.8 at
    * arity 2, 1.2–1.7× slower in both clean reps — on that corpus the
    * ambiguous set stays ≈ n for every round, so the extra lookup
    * joins cost more than the saved sorts). The knob ships for corpora
    * whose ambiguous set decays fast, where the lookup joins touch
    * only the small pending side. */
  private[graft] val DefaultArity = 2

  /** Round-12 A-B'd default (BENCH_sa_base_ab_r12.json): ranking on
    * 8-token slices at round 0 removes the three full-corpus sort
    * rounds (spans 1, 2 and 4) that rarely individuate natural text,
    * at the price of ~8× wider round-0 sort rows. Measured ladder at
    * sf10, identical extents at every width: 1 → 4 was 0.81× on the
    * family medians; 4 → 8 a further 0.77–0.83× (2 interleaved
    * fresh-JVM pairs, 277.6/227.2 → 212.5/188.8 s), with sf0.1 at
    * parity — the wider sort rows stay cheaper than a full-corpus
    * sort round until the slice width approaches typical repeat
    * lengths. Round 13 located that knee AT 8: widths 16 and 32 were
    * measured-and-REJECTED (BENCH_sa_ladder_ab_r13.json, 3 interleaved
    * fresh-JVM reps — family medians 195.2/232.2 s vs 172.8 at width
    * 8, no clean rep where wider wins: past width 8 the round-0 sort
    * rows grow linearly while the saved full-corpus rounds are
    * already gone). */
  private[graft] val DefaultBaseWidth = 8

  /** [[computeExtentsDistinct]] behind a measured-routed
    * EXACT-DUPLICATE COLLAPSE. A suffix's content depends only on its
    * text, so the suffix ordering — the expensive part — runs over ONE
    * representative per distinct text. Exactness of the re-expansion:
    *   - a text with ≥ 2 copies: EVERY position's full remaining
    *     suffix repeats verbatim in a twin copy, so
    *     `dup_len(pos) = n_tokens − pos` in closed form (it is both
    *     attained and an upper bound) — no ordering needed at all;
    *   - a unique text: every distinct content in the full corpus is
    *     present exactly once in the representative corpus, so a
    *     repeat exists there iff it exists in the full corpus, and the
    *     distinct-corpus extents transfer unchanged (a repeat against
    *     the 2nd..nth copy of a duplicated text is a repeat against
    *     its representative).
    * Real corpora are heavily exact-duplicated (which is why exact
    * dedup is a pipeline stage at all), so this turns the dominant
    * cost from O(total tokens · log maxLen) sorts into O(distinct
    * tokens · log maxLen) + one text-keyed aggregation + one
    * AQE-skew-splittable join — the collapse a 100 TB run cannot skip.
    * Grouping is on the raw text (never a hash): a hash collision
    * would silently merge distinct texts, and exactness here is
    * oracle-checked. */
  private def computeExtents(df: DataFrame, idCol: String, textCol: String,
                             minLen: Int, maxRounds: Int,
                             baseWidth: Int, arity: Int = DefaultArity): DataFrame = {
    val base = graft.Parallelism.spread(df).select(col(idCol), col(textCol))
    // MEASURED routing (the editdist-chooser pattern): the collapse
    // pays one full text-keyed aggregation up front — on mostly-unique
    // corpora that is pure tax (+9% measured at sf0.1, 0.16% dup), on
    // heavily exact-duplicated ones it removes the bulk of the suffix
    // sort (0.39× measured on a 98%-dup 250k-doc corpus,
    // BENCH_sa_collapse_r11.json). A 10% sampled distinct-count
    // estimates the collapsible fraction; the estimate is conservative
    // in exactly the right direction — a duplicate pair is seen only
    // if BOTH copies land in the sample, so small clusters (small
    // savings) route to the direct path. Both paths are EXACT; the
    // probe is one sampled aggregation at construction (this operator
    // is already construction-eager through SharedFrames).
    val probe = base.sample(withReplacement = false, 0.1, seed = 7)
      .agg(count(lit(1)).as("__n"), countDistinct(col(textCol)).as("__d")).first()
    val (pn, pd) = (probe.getLong(0), probe.getLong(1))
    if (pn == 0L || (pn - pd).toDouble / pn < 0.1)
      return computeExtentsDistinct(df, idCol, textCol, minLen, maxRounds, baseWidth, arity)
    val groups = base.groupBy(col(textCol))
      .agg(min(col(idCol)).as("__rep"), count(lit(1)).as("__cnt"))
    val extD = computeExtentsDistinct(
      groups.select(col("__rep").as(idCol), col(textCol)),
      idCol, textCol, minLen, maxRounds, baseWidth, arity)
    val dupTexts = groups.filter(col("__cnt") >= 2)
    // duplicated reps' SA rows are superseded by the closed form below
    val uniqExt = extD.join(dupTexts.select(col("__rep").as(idCol)),
      Seq(idCol), "left_anti")
    val dupExt = base
      .join(dupTexts
        .withColumn("__n", size(words(col(textCol))).cast("long"))
        .filter(col("__n") >= minLen)
        .select(col(textCol), col("__n")), Seq(textCol))
      .select(col(idCol), col("__n").as("n_tokens"),
        explode(sequence(lit(0), (col("__n") - minLen).cast("int"))).as("pos"))
      .select(col(idCol), col("n_tokens"), col("pos"),
        (col("n_tokens") - col("pos")).as("dup_len"))
    uniqExt.unionByName(dupExt)
  }

  private def computeExtentsDistinct(df: DataFrame, idCol: String, textCol: String,
                                     minLen: Int, maxRounds: Int,
                                     baseWidth: Int, arity: Int): DataFrame = {
    val docsArr = Dedup.cachedCorpus(graft.Parallelism.spread(df)
      .select(col(idCol), words(col(textCol)).as("__ws"))
      .filter(size(col("__ws")) >= minLen)
      .select(col(idCol), col("__ws"), size(col("__ws")).cast("long").as("n_tokens")))

    // one head pass: max length (empty guard) + whether any token
    // contains NUL (the binary base key's separator — see below)
    val head = docsArr.agg(max("n_tokens"),
      max(when(exists(col("__ws"), t => t.contains("\u0000")), 1).otherwise(0))).first()
    if (head.isNullAt(0))
      // no doc long enough: empty result, right schema
      return docsArr.select(col(idCol), col("n_tokens"),
        lit(0).as("pos"), lit(0L).as("dup_len")).limit(0)
    val nulFree = head.getInt(1) == 0

    // --- 1. prefix doubling ------------------------------------------
    // Head ranks (rank = global index of the class head) let a round
    // refine ONLY the still-ambiguous classes: a class of size s owns
    // the rank range [r, r+s), so its refinement (r + within-class
    // offset) never collides with — and never has to re-rank — the
    // already-singleton rest of the corpus. Natural text individuates
    // almost every suffix within the first few rounds, so after
    // span ≈ 8 the ambiguous set collapses to the true repeat mass
    // and each remaining round is a scan + small broadcast join
    // instead of a full corpus sort (the withDenseRank formulation
    // re-sorted ALL n positions every round).
    //
    // WIDE BASE RANK (round 12): round 0 ranks each suffix by its
    // first `baseWidth` tokens — the key is the raw token slice,
    // compared as array<string> (Spark array ordering is
    // lexicographic with shorter-prefix-first, which is EXACTLY
    // finite-suffix order: a suffix within baseWidth of its doc end
    // keys on its full remaining tokens, so equal keys of unequal
    // remaining length are impossible). The loop then starts at span
    // baseWidth, skipping the log2(baseWidth) earliest rounds — the
    // ones whose 1–2-token prefixes can never individuate natural
    // text, so they full-corpus-sort ~n rows each. The key is
    // CONTENT, never a hash: a hash collision would silently merge
    // distinct suffix classes, and this construction is oracle-exact.
    // BINARY BASE KEY (round 13): when no token contains NUL (checked
    // in the head pass above — NUL sorts below every other character),
    // the slice keys join into ONE NUL-separated string instead of an
    // array<string>. Order equivalence: within-token differences
    // compare identically; at a token boundary the separator beats any
    // token character (so token "ab" < token "abc" ⇒ "…ab\0…" <
    // "…abc…"), and a shorter slice's joined form is a strict prefix
    // of any extension (shorter-prefix-first = finite-suffix order,
    // same as the array form). Why it pays: string sort keys ride
    // Spark's 8-byte UnsafeRow sort-prefix fast path and skip the
    // per-position 8-element array allocation; array<string> keys
    // compare through the interpreted ordering on every comparison.
    // A NUL-containing corpus (adversarial — words() never produces
    // one from whitespace splitting of sane text, but parquet can hold
    // anything) falls back to the array form: exactness never rests on
    // the separator assumption.
    val toks =
      if (baseWidth <= 1)
        docsArr.select(col(idCol), col("n_tokens"),
          posexplode(col("__ws")).as(Seq("pos", "__t")))
      else if (nulFree)
        docsArr.select(col(idCol), col("n_tokens"),
          posexplode(expr(
            s"transform(__ws, (x, i) -> array_join(slice(__ws, i + 1, $baseWidth), chr(0)))"))
            .as(Seq("pos", "__t")))
      else
        docsArr.select(col(idCol), col("n_tokens"),
          posexplode(expr(s"transform(__ws, (x, i) -> slice(__ws, i + 1, $baseWidth))"))
            .as(Seq("pos", "__t")))
    // the singleton/ambiguous split and the class-head rank both ride
    // the ranking sort itself (GlobalOrder.withHeadRankFlagged): one
    // parallel sort per round, no groupBy shuffles, no split joins
    val r0 = GlobalOrder.withHeadRankFlagged(toks, Nil, Seq(col("__t")), "__r", "__amb")
    val all0 = graft.Checkpoints.checkpoint(r0.drop("__t"))
    val cols = Seq(col(idCol), col("n_tokens"), col("pos"), col("__r"))
    // frozen pieces (classes proven singleton) + the active remainder;
    // their union is the full rank table at any round
    // Both splits are MATERIALIZED slim: frozen pieces are rescanned by
    // every later round's rankedView, so leaving them as lazy filters
    // over the full per-round checkpoints would re-read each round's
    // whole refined set (≈ the duplicate mass, which on low-entropy
    // corpora stays ≈ n for all ⌈log2 maxLen⌉ rounds) once per LATER
    // round — a quadratic-in-rounds scan. Materialized, the pieces are
    // disjoint and total ≤ n rows at any round.
    val frozenParts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    frozenParts += graft.Checkpoints.checkpoint(
      all0.filter(!col("__amb")).select(cols: _*))
    var pend = graft.Checkpoints.checkpoint(
      all0.filter(col("__amb")).select(cols: _*))
    var span = baseWidth.toLong
    // ROUND GATE (round 12): stop when span covers every pending
    // row's remaining suffix, not when it covers the longest DOC.
    // Once span ≥ max(n_tokens − pos) over the pending set, every
    // pending class's shared rank already encodes its members' full
    // remaining suffixes (the −1 end-marker chain orders doc-final
    // suffixes like finite strings), so equal rank = identical
    // suffixes — exactly the loop's exit invariant — and further
    // rounds provably refine nothing while still paying a sort each.
    // A corpus whose longest doc is 4096 tokens but whose ambiguous
    // classes are all short repeats would otherwise pay ~9 dead
    // rounds. One aggregate replaces the isEmpty probe (same job
    // count per round, strictly more information).
    def pendGate(): Long = { // max remaining length, 0 when empty
      val r = pend.agg(max(col("n_tokens") - col("pos"))).first()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    while (span < pendGate()) {
      val rankedView = (frozenParts :+ pend).reduce(_ unionByName _)
      // suffix at pos p extends with the ranks of the suffixes at
      // p + j·span for j = 1..arity−1 (binary doubling is arity 2 —
      // one partner; k-ary combines k−1 partners per round and
      // multiplies span by k, exactness per the lexicographic
      // composition argument: components j < k agree whenever the
      // first difference lies beyond (j+1)·span, and a −1 end marker
      // orders a proper-prefix suffix strictly first at its first
      // absent partner). Each partner lookup shifts the rank view by
      // −j·span so the probe is a plain equi-join. Positions with
      // pos ≥ n_tokens − j·span have no partner — knowable
      // arithmetically, so the join stays INNER (broadcastable on the
      // shrinking active side; a left join would force the full
      // corpus-sized lookup through a shuffle).
      var paired = pend
      val partnerCols = (1 until arity).map(j => s"__p$j")
      for (j <- 1 until arity) {
        val shift = span * j
        val nearEnd = paired.filter(col("pos") >= col("n_tokens") - lit(shift))
          .withColumn(s"__p$j", lit(-1L))
        val lookup = rankedView.select(col(idCol), (col("pos") - lit(shift)).as("pos"),
          col("__r").as(s"__p$j"))
        val far = paired.filter(col("pos") < col("n_tokens") - lit(shift))
          .join(lookup, Seq(idCol, "pos"))
        paired = far.unionByName(nearEnd)
      }
      // within class [r, r+s): new rank = r + (rows strictly before
      // this row's (r, partners…) run) = r + __sh − __ch, where __ch
      // (the block head = min(__sh) over the class, contiguous under
      // the sort) and the new class's size>1 flag are computed inside
      // the ranking pass itself — every member of an ambiguous class
      // is in the subset, so the offsets are exact
      val sub = GlobalOrder.withHeadRankFlagged(paired, Seq(col("__r")),
        partnerCols.map(col), "__sh", "__amb", Some("__ch"))
      val refined = graft.Checkpoints.checkpoint(
        sub.select(col(idCol), col("n_tokens"), col("pos"),
          (col("__r") + col("__sh") - col("__ch")).as("__r"), col("__amb")))
      frozenParts += graft.Checkpoints.checkpoint(
        refined.filter(!col("__amb")).select(cols: _*))
      pend = graft.Checkpoints.checkpoint(
        refined.filter(col("__amb")).select(cols: _*))
      span *= arity
    }
    // classes still ambiguous when the gate closes are genuinely
    // identical suffixes (to their doc ends) — their shared rank is
    // final
    val ranked = (frozenParts :+ pend).reduce(_ unionByName _)

    // --- 2. SA adjacency (suffixes that can host a >=minLen repeat) ---
    val suff = ranked.filter(col("pos") <= col("n_tokens") - minLen)
      .withColumn("__rem", col("n_tokens") - col("pos"))
    val adj = GlobalOrder.withPrev(suff,
      Seq(col("__r"), col(idCol), col("pos")), Seq(idCol, "pos", "__r", "__rem"))
    val pairs = adj.filter(col(s"__prev_$idCol").isNotNull)
      .select(col(s"__prev_$idCol").as("idA"), col("__prev_pos").as("posA"),
        col("__prev___r").as("rA"), col("__prev___rem").as("remA"),
        col(idCol).as("idB"), col("pos").as("posB"),
        col("__r").as("rB"), col("__rem").as("remB"))

    // --- 3. neighbor LCPs ---------------------------------------------
    // equal ranks = identical suffixes to their doc ends
    val eqLcp = pairs.filter(col("rA") === col("rB"))
      .select(col("idA"), col("posA"), col("idB"), col("posB"),
        least(col("remA"), col("remB")).as("lcp"))
    // 128-bit gram prefilter: unequal hashes PROVE lcp < minLen (drop);
    // equal hashes proceed to exact chunk comparison from off = minLen
    val grams = docsArr.select(col(idCol),
        posexplode(Dedup.positionalShingleArray(minLen)).as(Seq("pos", "__g")))
      .select(col(idCol), col("pos"),
        xxhash64(col("__g")).as("gh1"), xxhash64(lit("s2"), col("__g")).as("gh2"))
    val gA = grams.select(col(idCol).as("idA"), col("pos").as("posA"),
      col("gh1").as("a1"), col("gh2").as("a2"))
    val gB = grams.select(col(idCol).as("idB"), col("pos").as("posB"),
      col("gh1").as("b1"), col("gh2").as("b2"))
    var active = graft.Checkpoints.checkpoint(
      pairs.filter(col("rA") =!= col("rB"))
        .join(gA, Seq("idA", "posA")).join(gB, Seq("idB", "posB"))
        .filter(col("a1") === col("b1") && col("a2") === col("b2"))
        .select(col("idA"), col("posA"), col("idB"), col("posB"),
          lit(minLen.toLong).as("__off"), least(col("remA"), col("remB")).as("__lim")))
    val wsA = docsArr.select(col(idCol).as("idA"), col("__ws").as("__wsA"))
    val wsB = docsArr.select(col(idCol).as("idB"), col("__ws").as("__wsB"))
    val done = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    done += eqLcp
    var chunk = minLen.toLong
    var rounds = 0
    while (rounds < maxRounds && !active.isEmpty) {
      val step = graft.Checkpoints.checkpoint(
        active.join(wsA, Seq("idA")).join(wsB, Seq("idB"))
        .withColumn("__z", zip_with(
          expr(s"slice(__wsA, cast(posA + __off + 1 as int), ${chunk.toInt})"),
          expr(s"slice(__wsB, cast(posB + __off + 1 as int), ${chunk.toInt})"),
          (x, y) => coalesce(x === y, lit(false))))
        .withColumn("__fp", expr("array_position(__z, false)"))
        .withColumn("__adv",
          when(col("__fp") > 0, col("__fp") - 1).otherwise(size(col("__z")).cast("long")))
        .select(col("idA"), col("posA"), col("idB"), col("posB"),
          (col("__off") + col("__adv")).as("__off"), col("__lim"),
          (col("__fp") > 0 || col("__adv") < chunk).as("__mismatch"))
        .withColumn("__done", col("__mismatch") || col("__off") >= col("__lim")))
      done += step.filter(col("__done"))
        .select(col("idA"), col("posA"), col("idB"), col("posB"),
          least(col("__off"), col("__lim")).as("lcp"))
      active = step.filter(!col("__done"))
        .select("idA", "posA", "idB", "posB", "__off", "__lim")
      chunk = math.min(chunk * 2, Int.MaxValue / 4)
      rounds += 1
    }
    require(active.isEmpty,
      s"repeatExtents chunk resolution did not converge in $maxRounds rounds")

    // dup_len(pos) = max LCP with either SA neighbor
    val lcps = done.reduce(_ unionByName _)
    val byPos = lcps.select(col("idA").as(idCol), col("posA").as("pos"), col("lcp"))
      .unionByName(lcps.select(col("idB").as(idCol), col("posB").as("pos"), col("lcp")))
      .groupBy(col(idCol), col("pos")).agg(max("lcp").as("dup_len"))
      .filter(col("dup_len") >= minLen)
    byPos.join(docsArr.select(col(idCol), col("n_tokens")), Seq(idCol))
      .select(col(idCol), col("n_tokens"), col("pos"), col("dup_len"))
  }

  /** [[Dedup.duplicateSpans]]' exact counterpart at ANY minimum length:
    * per-doc merged spans of tokens covered by some substring of
    * length ≥ minLen occurring ≥ 2 times corpus-wide. Output matches
    * duplicateSpans — (idCol, n_tokens, dup_tokens, n_spans,
    * dup_fraction) — and at equal thresholds the two are spec-pinned
    * identical (both exact at token granularity); this path also works
    * BELOW a k-gram pipeline's shuffle width and reports exact repeat
    * extents on the way. */
  def duplicateSpansExact(df: DataFrame, idCol: String, textCol: String,
                          minLen: Int = 8, buildMinLen: Int = 0,
                          baseWidth: Int = DefaultBaseWidth,
                          arity: Int = DefaultArity): DataFrame = {
    val ext = repeatExtents(df, idCol, textCol, minLen, buildMinLen = buildMinLen,
        baseWidth = baseWidth, arity = arity)
      .withColumn("__end", col("pos") + col("dup_len") - 1)
    val w = Window.partitionBy(idCol).orderBy("pos")
    val prevMax = max(col("__end")).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    ext
      .withColumn("__brk", when(col("pos") <= prevMax + 1, lit(0)).otherwise(lit(1)))
      .withColumn("__isl", sum("__brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(idCol), col("n_tokens"), col("__isl"))
      .agg(min("pos").cast("long").as("__start"), max("__end").cast("long").as("__end"))
      .groupBy(col(idCol), col("n_tokens"))
      .agg(sum(col("__end") - col("__start") + 1).as("dup_tokens"),
        count(lit(1)).as("n_spans"))
      .withColumn("dup_fraction",
        round(col("dup_tokens").cast("double") / col("n_tokens"), 4))
  }

  /** The maximal repeated passages themselves: top `topN` longest
    * exact repeats, one row per run start (positions strictly inside a
    * longer repeat are suppressed: a position whose predecessor's
    * extent already reaches one token further is not a new passage).
    * Output: (idCol, pos, dup_len, passage), ordered dup_len desc with
    * (idCol, pos) tie-break — deterministic. */
  def longestPassages(df: DataFrame, idCol: String, textCol: String,
                      minLen: Int = 8, topN: Int = 20,
                      buildMinLen: Int = 0,
                      baseWidth: Int = DefaultBaseWidth,
                      arity: Int = DefaultArity): DataFrame = {
    require(topN > 0, s"topN must be positive, got $topN")
    val ext = repeatExtents(df, idCol, textCol, minLen, buildMinLen = buildMinLen,
      baseWidth = baseWidth, arity = arity)
    val w = Window.partitionBy(idCol).orderBy("pos")
    val runStarts = ext
      .withColumn("__ppos", lag("pos", 1).over(w))
      .withColumn("__plen", lag("dup_len", 1).over(w))
      .filter(col("__ppos").isNull || col("__ppos") =!= col("pos") - 1 ||
        col("__plen") < col("dup_len") + 1)
    val docsArr = Dedup.cachedCorpus(graft.Parallelism.spread(df)
      .select(col(idCol), words(col(textCol)).as("__ws")))
    runStarts.join(docsArr, Seq(idCol))
      .select(col(idCol), col("pos"), col("dup_len"),
        concat_ws(" ",
          expr("slice(__ws, cast(pos + 1 as int), cast(dup_len as int))")).as("passage"))
      .orderBy(col("dup_len").desc, col(idCol), col("pos"))
      .limit(topN)
  }
}
