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
  *    the admissible partner lengths, join on the length key) against
  *    the full corpus. Hot heads are boilerplate-dominated by
  *    construction, a vanishing minority in real corpora; a flipped
  *    sampling decision costs time, never correctness, because both
  *    routes are exact.
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

    val heads = graft.Parallelism.spread(df)
      .select(col(idCol).as("id"),
        substring(col(textCol), 1, headChars).as("__h"))
      .withColumn("__len", length(col("__h")))
    val nonEmpty = heads.filter(col("__len") >= 1)
      .withColumn("__q", expr(qOf("__len")))

    // chunk side: ≥ d+1 disjoint q-char chunks per head (count =
    // floor(L/q) ≥ d+1 since q = L div (d+1))
    val chunks = nonEmpty.select(col("id"), col("__q"), explode(array_distinct(
        expr("transform(sequence(1, __len - __q + 1, __q), i -> substring(__h, i, __q))")))
      .as("__s"))
    // gram side: all q'-grams for every chunk width q' a shorter
    // admissible partner might use
    val grams = nonEmpty
      .select(col("id"), col("__h"), col("__len"), explode(array_distinct(expr(
        s"transform(sequence(greatest(1, cast(floor(__len * $keep) as int)), __len)," +
          s" lp -> ${qOf("lp")})"))).as("__q"))
      .select(col("id"), col("__q"), explode(array_distinct(
        expr("transform(sequence(1, __len - __q + 1), i -> substring(__h, i, __q))")))
        .as("__s"))

    // hot-gram router: sampled per-(q, gram) document frequency on the
    // gram side — the side whose multiplicity explodes candidates
    val p = math.min(1.0, math.max(1e-6, skewSampleFrac))
    val probe = if (p >= 1.0) grams else grams.sample(withReplacement = false, p, seed = 42L)
    val hotKeys = broadcast(probe.groupBy("__q", "__s").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > hotDf * p).select("__q", "__s"))
    val hotIds = chunks.join(hotKeys, Seq("__q", "__s"), "left_semi")
      .select("id").distinct()

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
    val banded = nonEmpty.join(hotIds, Seq("id"), "left_semi")
      .select(col("id"), col("__len"))
      .unionByName(heads.filter(col("__len") === 0).select(col("id"), col("__len")))
    val bandCand = banded
      .select(col("id").as("sid"), explode(expr(
        s"sequence(__len - cast(floor(__len * $maxFrac) as int), ${olenMax("__len")})"))
        .as("__plen"))
      .join(heads.select(col("id").as("oid"), col("__len").as("__plen")), Seq("__plen"))
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
