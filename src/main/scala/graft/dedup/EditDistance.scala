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
  * Scale shape (the 100 TB plan, not the quadratic one):
  *  - EVERY head routes through the chunk–gram pigeonhole (IndexChunk
  *    family, Qin et al.), with the chunk width derived PER LENGTH:
  *    for a head of length L the worst admissible partner is
  *    `olenMax(L) = min(headChars, ceil(L/(1−maxFrac)))` (longer
  *    partners violate `lev ≥ |lenA−lenB|`), so the edit bound any
  *    pair with this head as its SHORTER side can reach is
  *    `d(L) = floor(olenMax(L)·maxFrac)`. Splitting the head into
  *    `≥ d+1` NON-OVERLAPPING `q(L) = L div (d+1)`-char chunks
  *    guarantees an edit script of ≤ d ops leaves ≥ 1 chunk intact as
  *    a contiguous substring of the partner, so candidates come from
  *    an equi-join of chunks against partner q-gram sets keyed on
  *    `(q, gram)` — a keyed shuffle, near-linear output, no
  *    broadcast-nested-loop anywhere (the round-7 short-head path
  *    was a BNLJ of the short minority against the whole corpus; on
  *    a short-text corpus that was the all-pairs join this Scaladoc
  *    promises to avoid). The gram side emits, per head of length L,
  *    the q-grams for every chunk width a shorter admissible partner
  *    might use (`q(L')` for `L' ∈ [floor(L·(1−maxFrac)), L]` — a
  *    handful of widths, usually one).
  *  - Hot-gram guard: a boilerplate gram with document frequency f
  *    contributes `f_chunk · f_gram` candidate rows, the same
  *    hot-shingle explosion [[Dedup.ngramJaccardPairsAuto]] routes
  *    around. Gram frequencies are measured on a Bernoulli sample
  *    (unbiased per-key expectation, shuffle shrinks ~p); heads
  *    owning ≥ 1 hot chunk leave the chunk path entirely — the
  *    pigeonhole cannot spare a designated chunk, so partial
  *    suppression would lose pairs whose only intact chunk is hot —
  *    and instead pair through a LENGTH-BANDED equi-join (explode to
  *    the admissible partner lengths, join on a SALTED length key —
  *    the bare key has ≤ headChars distinct values) against the full
  *    corpus. Hot heads are boilerplate-dominated by construction, a
  *    vanishing minority in real corpora; a flipped sampling decision
  *    costs time, never correctness, because both routes are exact.
  *    KNOWN DEGENERATION: the fallback is linear in |hot| · |band|.
  *    `substring(text, 1, headChars)` truncation makes `len ==
  *    headChars` the modal length in real corpora, so a
  *    template-heavy corpus where MANY heads go hot approaches
  *    all-pairs inside that one band — exact, but quadratic candidate
  *    rows: the cost cliff the chunk route exists to avoid, now
  *    gated behind the `hotDf` threshold. If profiling shows a large
  *    hot set, raise `hotDf` (more heads stay on the pigeonhole
  *    route) or add a secondary band key (e.g. a cold-prefix gram)
  *    before verification.
  * Candidates then verify with the codegen'd `levenshtein` kernel on
  * ≤ `headChars`-char strings. All routes are exact (no recall loss):
  * the per-length pigeonhole covers every pair of non-hot heads with
  * the shorter side's chunks, hot heads enumerate their length band,
  * and length-banding (`|lenA − lenB| ≤ d`) is implied by
  * `lev ≥ |lenA − lenB|`.
  */
object EditDistance {

  /** (doc1, doc2, dist): unordered pairs within the normalized head
    * edit-distance bound. Deterministic; `dist` is exact.
    * `hotDf`/`skewSampleFrac` tune the hot-gram router (see Scaladoc);
    * both candidate routes are exact, so they affect cost only. */
  def editDistancePairs(df: DataFrame, idCol: String, textCol: String,
                        maxFrac: Double = 0.1, headChars: Int = 80,
                        hotDf: Int = 64, skewSampleFrac: Double = 0.1): DataFrame = {
    require(headChars >= 1, s"headChars must be >= 1, got $headChars")
    require(maxFrac >= 0 && maxFrac < 0.5, s"maxFrac must be in [0, 0.5), got $maxFrac")
    val keep = 1 - maxFrac

    // per-length chunk parameters as SQL over a length expression.
    // ceil on olenMax / floor on the shorter-partner bound keep every
    // float rounding on the SUPERSET side (a candidate set too large
    // costs time; too small loses pairs).
    def olenMax(lp: String) = s"least($headChars, cast(ceil(($lp) / $keep) as int))"
    def dOf(lp: String) = s"cast(floor(${olenMax(lp)} * $maxFrac) as int)"
    def qOf(lp: String) = s"greatest(1, ($lp) div (${dOf(lp)} + 1))"

    // ONE slim cached row per head: every downstream frame (chunks,
    // grams, probe, band lookup, verify sides) derives from this cache
    // with a single projection/explode — the round-8 shape recomputed
    // the scan+substring pipeline once per consumer (grams twice,
    // chunks twice, heads four times), which benchmarked at 4.5× the
    // round-7 cost. The cache is tracked (Dedup.cachedCorpus), so the
    // harness-level releaseCaches() reclaims it between queries.
    val heads = Dedup.cachedCorpus(graft.Parallelism.spread(df)
      .select(col(idCol).as("id"),
        substring(col(textCol), 1, headChars).as("__h"))
      .withColumn("__len", length(col("__h"))))
    val nonEmpty = heads.filter(col("__len") >= 1)
      .withColumn("__q", expr(qOf("__len")))

    // chunk side: ≥ d+1 disjoint q-char chunks per head (count =
    // floor(L/q) ≥ d+1 since q = L div (d+1)). Consumed twice (hot-id
    // semi-join + candidate join) but NOT cached: it re-derives from
    // the cached heads with one in-memory explode, cheaper than
    // materializing ~(d+1)·n slim rows to storage and reading them back
    val chunks = nonEmpty.select(col("id"), col("__q"), explode(array_distinct(
        expr("transform(sequence(1, __len - __q + 1, __q), i -> substring(__h, i, __q))")))
      .as("__s"))
    // gram side: all q'-grams for every chunk width q' a shorter
    // admissible partner might use. NOT cached — it is the one
    // explode-heavy frame (~headChars rows per head), and after the
    // probe below samples HEADS (not gram rows) it has exactly one
    // consumer, so caching would only add a full materialization.
    def gramsOf(h: DataFrame): DataFrame = h
      .select(col("id"), col("__h"), col("__len"), explode(array_distinct(expr(
        s"transform(sequence(greatest(1, cast(floor(__len * $keep) as int)), __len)," +
          s" lp -> ${qOf("lp")})"))).as("__q"))
      .select(col("id"), col("__q"), explode(array_distinct(
        expr("transform(sequence(1, __len - __q + 1), i -> substring(__h, i, __q))")))
        .as("__s"))
    val grams = gramsOf(nonEmpty)

    // hot-gram router: sampled per-(q, gram) document frequency on the
    // gram side — the side whose multiplicity explodes candidates.
    // Heads are sampled BEFORE the gram explode: per (q, gram) the
    // surviving count is Binomial(df, p) either way (gram rows are
    // distinct per head), but the explode then runs over p·n heads
    // instead of all of them.
    val p = math.min(1.0, math.max(1e-6, skewSampleFrac))
    val probe = gramsOf(
      if (p >= 1.0) nonEmpty
      else nonEmpty.sample(withReplacement = false, p, seed = 42L))
    val hotKeys = broadcast(probe.groupBy("__q", "__s").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > hotDf * p).select("__q", "__s"))
    // small (hot heads are a boilerplate minority) but consumed twice
    // (candidate anti-join + band semi-join) — cache, not recompute
    val hotIds = Dedup.cachedCorpus(
      chunks.join(hotKeys, Seq("__q", "__s"), "left_semi")
        .select("id").distinct())

    // safe heads: keyed equi-join on (q, gram); the gram side keeps ALL
    // heads (a hot head can still be the LONGER partner of a safe one)
    val fullCand = chunks.join(hotIds, Seq("id"), "left_anti")
      .join(grams.withColumnRenamed("id", "id2"), Seq("__q", "__s"))
      .filter(col("id") =!= col("id2"))
      .select(least(col("id"), col("id2")).as("doc1"),
        greatest(col("id"), col("id2")).as("doc2"))
      .distinct()

    // hot heads (plus empty heads, whose chunking is degenerate):
    // length-banded equi-join against the whole corpus — explode to
    // admissible partner lengths, join on the length key. lev ≥
    // |lenA − lenB| makes the band exact in both directions.
    // SALTED: __len ≤ headChars means the bare length key has ≤
    // headChars (~80) distinct values — a full-corpus shuffle onto 80
    // reducers, a guaranteed straggler if hot heads are ever numerous
    // (template-heavy corpora truncate most heads to exactly headChars,
    // making one length modal). The hot (small) side replicates each
    // banded row across all `salts` values; the corpus side takes one
    // salt from its id hash — every (sid, oid) pair still meets exactly
    // once, on exactly one (length, salt) key, but the shuffle now has
    // headChars × salts keys. Both routes stay exact; salting moves
    // cost only.
    // salt breadth tracks cluster width: replication (the hot side
    // pays ×salts rows) only buys anything when the shuffle has more
    // reducer slots than bare length keys, so a 32-thread local run
    // uses a handful of salts while a 1000-executor cluster gets the
    // full spread. Measured at sf0.1/local[32]: a fixed ×32 salt cost
    // +5 s on the query for zero local benefit.
    val salts = math.max(1, math.min(32,
      df.sparkSession.sparkContext.defaultParallelism / 8))
    val banded = nonEmpty.join(hotIds, Seq("id"), "left_semi")
      .select(col("id"), col("__len"))
      .unionByName(heads.filter(col("__len") === 0).select(col("id"), col("__len")))
    val bandCand = banded
      .select(col("id").as("sid"), explode(expr(
        s"sequence(__len - cast(floor(__len * $maxFrac) as int), ${olenMax("__len")})"))
        .as("__plen"))
      .withColumn("__salt", explode(expr(s"sequence(0, ${salts - 1})")))
      .join(heads.select(col("id").as("oid"), col("__len").as("__plen"),
          pmod(xxhash64(col("id")), lit(salts)).cast("int").as("__salt")),
        Seq("__plen", "__salt"))
      .filter(col("sid") =!= col("oid"))
      .select(least(col("sid"), col("oid")).as("doc1"),
        greatest(col("sid"), col("oid")).as("doc2"))
      .distinct()

    // verify candidates with the exact DP kernel
    val hA = heads.select(col("id").as("doc1"), col("__h").as("__hA"), col("__len").as("__lA"))
    val hB = heads.select(col("id").as("doc2"), col("__h").as("__hB"), col("__len").as("__lB"))
    fullCand.unionByName(bandCand).distinct()
      .join(hA, Seq("doc1")).join(hB, Seq("doc2"))
      .withColumn("dist", levenshtein(col("__hA"), col("__hB")).cast("long"))
      .filter(col("dist") <= floor(greatest(col("__lA"), col("__lB")) * maxFrac))
      .select(col("doc1"), col("doc2"), col("dist"))
  }
}
