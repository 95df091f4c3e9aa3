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
  *  - Full-length heads (len == headChars — the overwhelming majority
  *    in a web/training corpus) pair via the chunk–gram pigeonhole
  *    (IndexChunk family, Qin et al.): split each head into
  *    `floor(headChars/q)` NON-OVERLAPPING q-char chunks with
  *    `q = headChars / (d+1)`, so there are ≥ d+1 disjoint chunks; an
  *    edit script of ≤ d ops touches ≤ d of them, and any untouched
  *    chunk survives as a contiguous substring of the partner. Hence
  *    candidates = equi-join of one side's chunks against the other
  *    side's full q-gram set — keyed shuffle on rare 8-char grams,
  *    near-linear output, no all-pairs anywhere.
  *  - Heads shorter than `headChars` (truncated docs — a small
  *    minority by construction in a corpus of real documents) pair
  *    against everything in their length band via a broadcast of just
  *    the short side.
  * Candidates then verify with the codegen'd `levenshtein` kernel on
  * ≤ `headChars`-char strings. Both routes are exact (no recall loss):
  * the pigeonhole argument covers equal-length pairs, the short route
  * enumerates its band, and length-banding (`|lenA − lenB| ≤ d`) is
  * implied by `lev ≥ |lenA − lenB|`.
  */
object EditDistance {

  /** (doc1, doc2, dist): unordered pairs within the normalized head
    * edit-distance bound. Deterministic; `dist` is exact. */
  def editDistancePairs(df: DataFrame, idCol: String, textCol: String,
                        maxFrac: Double = 0.1, headChars: Int = 80): DataFrame = {
    require(headChars >= 1, s"headChars must be >= 1, got $headChars")
    require(maxFrac >= 0 && maxFrac < 0.5, s"maxFrac must be in [0, 0.5), got $maxFrac")
    val dFull = (maxFrac * headChars).toInt       // bound for two full heads
    val q = math.max(1, headChars / (dFull + 1))  // ≥ d+1 disjoint chunks fit

    val heads = graft.Parallelism.spread(df)
      .select(col(idCol).as("id"),
        substring(col(textCol), 1, headChars).as("__h"))
      .withColumn("__len", length(col("__h")))
    val full = heads.filter(col("__len") === headChars)
    val short = heads.filter(col("__len") < headChars)

    // full × full: chunk ⋈ gram pigeonhole candidates
    val chunks = full.select(col("id"), explode(array_distinct(
        expr(s"transform(sequence(1, ${headChars - q + 1}, $q), i -> substring(__h, i, $q))")))
      .as("__s"))
    val grams = full.select(col("id"), explode(array_distinct(
        expr(s"transform(sequence(1, ${headChars - q + 1}), i -> substring(__h, i, $q))")))
      .as("__s"))
    val fullCand = chunks.join(grams.withColumnRenamed("id", "id2"), Seq("__s"))
      .filter(col("id") =!= col("id2"))
      .select(least(col("id"), col("id2")).as("doc1"),
        greatest(col("id"), col("id2")).as("doc2"))
      .distinct()

    // pairs with ≥ 1 short side: broadcast the short minority against
    // its length band (lev ≥ |lenA − lenB| makes the band exact)
    val shortCand = broadcast(short.select(col("id").as("sid"), col("__len").as("slen")))
      .join(heads.select(col("id").as("oid"), col("__len").as("olen")),
        col("sid") =!= col("oid") &&
          abs(col("slen") - col("olen")) <=
            floor(greatest(col("slen"), col("olen")) * maxFrac))
      .select(least(col("sid"), col("oid")).as("doc1"),
        greatest(col("sid"), col("oid")).as("doc2"))
      .distinct()

    // verify candidates with the exact DP kernel
    val hA = heads.select(col("id").as("doc1"), col("__h").as("__hA"), col("__len").as("__lA"))
    val hB = heads.select(col("id").as("doc2"), col("__h").as("__hB"), col("__len").as("__lB"))
    fullCand.unionByName(shortCand).distinct()
      .join(hA, Seq("doc1")).join(hB, Seq("doc2"))
      .withColumn("dist", levenshtein(col("__hA"), col("__hB")).cast("long"))
      .filter(col("dist") <= floor(greatest(col("__lA"), col("__lB")) * maxFrac))
      .select(col("doc1"), col("doc2"), col("dist"))
  }
}
