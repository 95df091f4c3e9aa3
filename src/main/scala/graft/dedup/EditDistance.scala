package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded edit-distance (Levenshtein) similarity self-join — the
  * character-level near-dup family the token-set operators
  * ([[Dedup.ngramJaccardPairsAuto]], MinHash, SimHash) cannot express:
  * Jaccard on word shingles is blind to within-token typo edits, and
  * two docs can share every 3-gram set yet differ by many character
  * edits. Complements the reference's content-equality dedup surface
  * (exact dup detection, `private/df.rkt`'s series equality) with the
  * standard approximate-string-join from the record-linkage
  * literature.
  *
  * Semantics: over each document's HEAD (first `headChars` chars — the
  * fingerprint region; titles/boilerplate make heads the standard
  * dedup key), all unordered pairs with
  * `lev(headA, headB) <= floor(maxFrac * max(lenA, lenB))`.
  *
  * Scale shape (the 100 TB plan, not the quadratic one): POSITION-AWARE
  * partition matching after PassJoin (Li, Deng, Feng, "PASS-JOIN: a
  * partition-based method for similarity joins", PVLDB 2011).
  *
  *  - INDEXED side: each head of length L — in its role as the
  *    SHORTER member of a pair — partitions into
  *    `c(L) = d(L)+1` contiguous disjoint segments at FIXED positions
  *    (first `c−k` of width `L div c`, last `k = L mod c` one wider),
  *    where `d(L) = floor(olenMax(L)·maxFrac)` is the largest edit
  *    budget any admissible longer partner can grant
  *    (`olenMax(L) = min(headChars, ceil(L/(1−maxFrac)))` — longer
  *    partners violate `lev ≥ |lenA−lenB|`). Each single-char edit op
  *    touches at most one segment, so a pair within budget τ ≤ d(L)
  *    leaves ≥ c−τ ≥ 1 segments copied VERBATIM into the partner.
  *  - PROBE side: each head of length L — in its role as the LONGER
  *    member — enumerates, for every admissible shorter length
  *    `L' ∈ [L − τ(L), L]` with `τ(L) = floor(L·maxFrac)` and every
  *    segment index i of the L'-partition, the content of that
  *    segment's would-be image: `substring(__h, p_i + s, l_i)` at
  *    every shift `s` with `|s| + |Δ − s| ≤ τ` (Δ = L − L'). The
  *    window is EXACT, not heuristic: an intact segment's image
  *    starts at `p_i + s` where s = net indels before it, the edits
  *    before and after it number ≥ |s| and ≥ |Δ − s|, and the total
  *    is ≤ τ — so every within-budget pair meets on ≥ 1
  *    `(L', i, content)` key. ~(τ+1) shifts × c(L') segments ×
  *    (τ+1) lengths ≈ a few hundred slim rows per head: linear,
  *    keyed, shuffle-joinable.
  *  - WHY position-aware: the previous chunk–gram pigeonhole joined
  *    on position-FREE `(width, gram)` keys, so every boilerplate
  *    q-gram ("the ", template vocabulary) went hot corpus-wide —
  *    measured at sf0.1, 4978 of 5000 heads diverted to the
  *    length-band fallback, whose candidate set (11.5M pairs) WAS
  *    the all-pairs join the route exists to avoid (≈125B pairs at
  *    sf10). A common substring only collides on a PassJoin key when
  *    it sits in the same segment of same-length partners at a shift
  *    admissible under the budget — per-key document frequency
  *    collapses from corpus-wide to near-constant.
  *  - Hot-segment guard via OVER-PARTITIONING: the partition uses
  *    `c = d+1+extraSegs` segments (clamped to the head length),
  *    `extraSegs` more than the pigeonhole minimum. With τ ≤ d edits
  *    destroying ≤ τ segments, ≥ c−τ ≥ extraSegs+1 segments stay
  *    intact — so a head owning ≤ extraSegs HOT segments (per-key
  *    document frequency over `hotDf`, measured on a Bernoulli
  *    head-sample of the probe side) still has ≥ 1 intact COLD
  *    segment, and its hot segment ROWS can simply be dropped from
  *    the indexed side: suppression, not diversion, at zero recall
  *    loss. Only heads with MORE than extraSegs hot segments — the
  *    verbatim-banner pathology, where a corpus-wide template
  *    occupies most of the head — divert to a LENGTH-BANDED
  *    equi-join (explode to admissible partner lengths, SALTED
  *    length key — the bare key has ≤ headChars distinct values).
  *    The previous design diverted a head for ANY hot segment; on
  *    the template-vocabulary bench corpus that sent 16% of heads
  *    (787/5000 at sf0.1) to a |hot|·|corpus| fallback — ~39B pairs
  *    extrapolated to sf10. With suppression the divert set is
  *    heads that are boilerplate in ≥ 3 of ~11 segments — near zero
  *    on anything but actual banner spam. A flipped sampling
  *    decision costs time, never correctness, because both routes
  *    are exact. KNOWN DEGENERATION: the fallback is linear in
  *    |hot| · |band|; a corpus whose heads are verbatim-identical
  *    banners pairs quadratically — but so does its true output.
  *
  * Candidates verify with the codegen'd BANDED `levenshtein(a, b,
  * threshold)` kernel (Ukkonen band, O(dMax·len) cells, early exit)
  * and only the verified survivors — not the candidate set — pay a
  * `distinct()`: the thresholded kernel returns −1 above
  * `dMax = floor(headChars·maxFrac) ≥` every per-pair bound, so the
  * ≥ 0 guard plus the per-pair bound filter is exactly the unbanded
  * semantics at a fraction of the DP cells, and deduplicating after
  * the filter shuffles hundreds of rows where deduplicating the
  * candidate set shuffled millions. All routes are exact (no recall
  * loss): the segment window covers every within-budget pair of
  * non-hot heads, hot heads enumerate their length band, and
  * length-banding (`|lenA − lenB| ≤ τ`) is implied by
  * `lev ≥ |lenA − lenB|`.
  */
object EditDistance {

  /** (doc1, doc2, dist): unordered pairs within the normalized head
    * edit-distance bound. Deterministic; `dist` is exact.
    * `hotDf`/`hotFrac`/`skewSampleFrac`/`extraSegs` tune the
    * hot-segment router (see Scaladoc); both candidate routes are
    * exact, so they affect cost only. The effective hot threshold is
    * `max(hotDf, hotFrac·n)` — RELATIVE to corpus size, because
    * per-key document frequency of merely-common segments grows
    * linearly with n (a small-vocabulary corpus has df ≈ n/150 keys
    * everywhere) while the pathology the router exists for is a
    * banner in a constant FRACTION of documents; a fixed absolute
    * threshold diverts more of the corpus the bigger it gets,
    * turning the fallback quadratic exactly when it matters. */
  def editDistancePairs(df: DataFrame, idCol: String, textCol: String,
                        maxFrac: Double = 0.1, headChars: Int = 80,
                        hotDf: Int = 64, skewSampleFrac: Double = 0.1,
                        extraSegs: Int = 2, hotFrac: Double = 0.05): DataFrame = {
    require(headChars >= 1, s"headChars must be >= 1, got $headChars")
    require(maxFrac >= 0 && maxFrac < 0.5, s"maxFrac must be in [0, 0.5), got $maxFrac")
    require(extraSegs >= 0, s"extraSegs must be >= 0, got $extraSegs")
    require(hotFrac > 0 && hotFrac <= 1, s"hotFrac must be in (0, 1], got $hotFrac")
    val keep = 1 - maxFrac

    // per-length partition parameters as SQL over a length expression.
    // ceil on olenMax keeps every float rounding on the SUPERSET side
    // (a candidate set too large costs time; too small loses pairs).
    // D-suffixed literals matter: a bare `0.9` parses as DECIMAL and
    // drags the whole lambda tree onto boxed decimal arithmetic —
    // measured 50 s for the probe enumeration vs ~2 s on doubles.
    def olenMax(lp: String) = s"least($headChars, cast(ceil(($lp) / ${keep}D) as int))"
    def dOf(lp: String) = s"cast(floor(${olenMax(lp)} * ${maxFrac}D) as int)"
    // segment scheme for a length-lp head as the SHORTER side: c
    // segments, first c-k of width lp div c, last k = lp mod c one
    // wider. Both sides derive (start, width) from (lp, i) alone, so
    // the emitter and the enumerator can never disagree.
    // c = d+1+extraSegs over-partitions for hot-segment suppression
    // (see Scaladoc), capped at lp so segments stay non-empty (the
    // inner greatest keeps the pigeonhole minimum d+1 even for heads
    // shorter than d+1 — only reachable at maxFrac > 0.4, where
    // zero-width segments degrade cost, never exactness).
    def cOf(lp: String) =
      s"greatest(least(${dOf(lp)} + 1 + $extraSegs, $lp), ${dOf(lp)} + 1)"
    def wBase(lp: String, c: String) = s"(($lp) div ($c))"
    def segW(lp: String, c: String, i: String) =
      s"(${wBase(lp, c)} + if(($i) > ($c) - (($lp) % ($c)), 1, 0))"
    def segP(lp: String, c: String, i: String) =
      s"((($i) - 1) * ${wBase(lp, c)} + greatest(0, ($i) - 1 - (($c) - (($lp) % ($c)))) + 1)"

    // ONE slim cached row per head: every downstream frame (segments,
    // probe enumerations, band lookup, verify sides) derives from this
    // cache with a single projection/explode. The cache is tracked
    // (Dedup.cachedCorpus), so the harness-level releaseCaches()
    // reclaims it between queries.
    val heads = Dedup.cachedCorpus(graft.Parallelism.spread(df)
      .select(col(idCol).as("id"),
        substring(col(textCol), 1, headChars).as("__h"))
      .withColumn("__len", length(col("__h"))))
    val nonEmpty = heads.filter(col("__len") >= 1)

    // indexed side: the c(L) fixed-position segments of each head
    // (its shorter-side partition). O(d+1) slim rows per head.
    val segs = nonEmpty.select(col("id"), col("__len").as("__lp"),
      explode(expr(
        s"""transform(sequence(1, ${cOf("__len")}),
            i -> struct(i as __i,
                        substring(__h, ${segP("__len", cOf("__len"), "i")},
                                       ${segW("__len", cOf("__len"), "i")}) as __s))"""))
        .as("__seg"))
      .select(col("id"), col("__lp"), col("__seg.__i").as("__i"), col("__seg.__s").as("__s"))

    // probe side: for every admissible shorter length lp, segment i of
    // the lp-partition, and exact-window shift s (|s| + |delta - s| <=
    // tau), the would-be image content. Duplicate (lp, i, content)
    // hits from different shifts are NOT collapsed here: array_distinct
    // over struct elements is a quadratic pairwise-comparison fallback
    // (~|enum|² ≈ 250k struct compares per head — measured 45 s of the
    // 50 s probe wall by itself) while letting the ~10% duplicate rows
    // ride costs a few redundant banded DPs absorbed by the
    // post-verify distinct. Position validity (start >= 1,
    // start + w - 1 <= L) is enforced by the filter() inside the
    // enumeration. The per-length
    // constants (d, segment base width, wide-segment cutoff, shift
    // window) are STAGED into structs so each is computed once per
    // admissible length, not once per (length, segment, shift) — the
    // naive nesting re-evaluated the ceil/floor tower ~c·(tau+1) times
    // per length and measured 25x slower.
    def probeOf(h: DataFrame): DataFrame = h
      .select(col("id"), col("__h"), explode(expr(
        s"""flatten(transform(
              transform(
                transform(
                  transform(
                    sequence(__len - cast(floor(__len * ${maxFrac}D) as int), __len),
                    lp -> struct(lp as lp, ${dOf("lp")} as d)),
                  t -> struct(t.lp as lp, t.d as d,
                              greatest(least(t.d + 1 + $extraSegs, t.lp), t.d + 1) as c)),
                u -> struct(u.lp as lp,
                            u.c as c,
                            (u.lp div u.c) as wb,
                            (u.c - (u.lp % u.c)) as ck,
                            cast(ceil(((__len - u.lp) - u.d) / 2.0D) as int) as slo,
                            ((__len - u.lp) + u.d) div 2 as shi)),
              r -> filter(
                flatten(transform(sequence(1, r.c),
                  i -> transform(sequence(r.slo, r.shi),
                    s -> struct(r.lp as __lp, i as __i,
                                ((i - 1) * r.wb + greatest(0, i - 1 - r.ck) + 1 + s) as __p,
                                (r.wb + if(i > r.ck, 1, 0)) as __w)))),
                x -> x.__p >= 1 and x.__p + x.__w - 1 <= __len)))"""))
        .as("__e"))
      .select(col("id"), col("__e.__lp").as("__lp"), col("__e.__i").as("__i"),
        expr("substring(__h, __e.__p, __e.__w)").as("__s"))
    // NOTE the shift window uses tau' = d(lp) >= tau(pair) =
    // floor(__len * maxFrac): a superset window (more shifts than the
    // pair's true budget admits) costs candidate rows, never pairs.
    val probe = probeOf(nonEmpty)

    // hot-segment router: sampled per-(lp, i, content) document
    // frequency on the probe side — the side whose multiplicity
    // explodes candidates. Heads are sampled BEFORE the enumeration:
    // per key the surviving count is Binomial(df, p) either way, but
    // the explode then runs over p·n heads instead of all of them.
    val p = math.min(1.0, math.max(1e-6, skewSampleFrac))
    val probeSample = probeOf(
      if (p >= 1.0) nonEmpty
      else nonEmpty.sample(withReplacement = false, p, seed = 42L))
    // scale-aware threshold: heads is already cached, so the count is
    // a cache scan, not a second source read
    val hotThreshold = math.max(hotDf.toDouble, hotFrac * heads.count())
    val hotKeys = broadcast(probeSample
      .groupBy("__lp", "__i", "__s").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > hotThreshold * p).select("__lp", "__i", "__s"))
    // divert set: heads with MORE hot segments than the
    // over-partition's spare capacity c − (d+1) ≤ extraSegs — for
    // anything else, dropping the hot rows below is lossless (≥ 1
    // intact cold segment survives any admissible edit script). Tiny
    // (banner-spam pathology only) but consumed twice (candidate
    // anti-join + band semi-join) — cache
    val hotIds = Dedup.cachedCorpus(
      segs.join(hotKeys, Seq("__lp", "__i", "__s"), "left_semi")
        .groupBy("id", "__lp").agg(count(lit(1)).as("__hot"))
        .filter(col("__hot") > expr(s"${cOf("__lp")} - (${dOf("__lp")} + 1)"))
        .select("id"))

    // kept heads: keyed equi-join on (shorter-length, segment-id,
    // content), with hot segment ROWS suppressed (broadcast
    // anti-join — exact given the divert rule above); the probe side
    // keeps ALL heads and ALL content (a diverted head can still be
    // the LONGER partner of a kept one, and a kept head must still
    // find partners through its partners' hot regions). NO distinct
    // here — the verified survivors pay it instead (see Scaladoc).
    val fullCand = segs.join(hotIds, Seq("id"), "left_anti")
      .join(hotKeys, Seq("__lp", "__i", "__s"), "left_anti")
      .join(probe.withColumnRenamed("id", "id2"), Seq("__lp", "__i", "__s"))
      .filter(col("id") =!= col("id2"))
      .select(least(col("id"), col("id2")).as("doc1"),
        greatest(col("id"), col("id2")).as("doc2"))

    // hot heads (plus empty heads, whose partition is degenerate):
    // length-banded equi-join against the whole corpus — explode to
    // admissible partner lengths, join on the length key. lev ≥
    // |lenA − lenB| makes the band exact in both directions.
    // SALTED: __len ≤ headChars means the bare length key has ≤
    // headChars (~80) distinct values — a full-corpus shuffle onto 80
    // reducers, a guaranteed straggler if hot heads are ever numerous.
    // The hot (small) side replicates each banded row across all
    // `salts` values; the corpus side takes one salt from its id hash
    // — every (sid, oid) pair still meets exactly once, on exactly one
    // (length, salt) key. Salt breadth tracks cluster width: a
    // 32-thread local run uses a handful of salts while a
    // 1000-executor cluster gets the full spread.
    val salts = math.max(1, math.min(32,
      df.sparkSession.sparkContext.defaultParallelism / 8))
    val banded = nonEmpty.join(hotIds, Seq("id"), "left_semi")
      .select(col("id"), col("__len"))
      .unionByName(heads.filter(col("__len") === 0).select(col("id"), col("__len")))
    val bandCand = banded
      .select(col("id").as("sid"), explode(expr(
        s"sequence(__len - cast(floor(__len * ${maxFrac}D) as int), ${olenMax("__len")})"))
        .as("__plen"))
      .withColumn("__salt", explode(expr(s"sequence(0, ${salts - 1})")))
      .join(heads.select(col("id").as("oid"), col("__len").as("__plen"),
          pmod(xxhash64(col("id")), lit(salts)).cast("int").as("__salt")),
        Seq("__plen", "__salt"))
      .filter(col("sid") =!= col("oid"))
      .select(least(col("sid"), col("oid")).as("doc1"),
        greatest(col("sid"), col("oid")).as("doc2"))

    // verify candidates with the exact DP kernel, BANDED: every
    // admissible pair has dist ≤ floor(max(lA,lB)·maxFrac) ≤
    // floor(headChars·maxFrac) =: dMax, so the thresholded kernel
    // (O((2·dMax+1)·len) cells instead of the full len² matrix, early
    // exit when a row's minimum exceeds the threshold) is exact here —
    // it returns the true distance for everything the filter could
    // keep and −1 (guarded below; −1 would sail through a bare
    // ≤-bound filter) only for pairs the full kernel would have
    // discarded anyway. distinct() runs LAST, over verified survivors:
    // candidate multiplicity (a pair meeting on several intact
    // segments, or on both routes) costs ≤ c redundant banded DPs, far
    // cheaper than a full-candidate-set shuffle.
    val dMax = math.floor(headChars * maxFrac).toInt
    val hA = heads.select(col("id").as("doc1"), col("__h").as("__hA"), col("__len").as("__lA"))
    val hB = heads.select(col("id").as("doc2"), col("__h").as("__hB"), col("__len").as("__lB"))
    fullCand.unionByName(bandCand)
      .join(hA, Seq("doc1")).join(hB, Seq("doc2"))
      .withColumn("dist", levenshtein(col("__hA"), col("__hB"), dMax).cast("long"))
      .filter(col("dist") >= 0 &&
        col("dist") <= floor(greatest(col("__lA"), col("__lB")) * maxFrac))
      .select(col("doc1"), col("doc2"), col("dist"))
      .distinct()
  }
}
