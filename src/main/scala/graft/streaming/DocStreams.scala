package graft.streaming

import graft.dedup.Dedup
import graft.functions.GraftFunctions
import graft.text.TextAnalysis
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming document curation: near-dup candidate detection at
  * ingest time — the streaming face of the batch MinHash/LSH banding
  * (`Dedup.bandPairs`).
  *
  * Shape: signature computation is a PER-ROW kernel (the in-row
  * `minhash_sig` expression over the doc's own shingle array — no
  * aggregation, so it is legal ahead of the one stateful operator),
  * band keys explode to (band, key) rows, and a single
  * flatMapGroupsWithState keyed by the band bucket holds the first
  * `maxBucket` doc ids seen per bucket. A new doc landing in a
  * non-empty bucket emits a candidate pair per resident — exactly the
  * batch equi-join's semantics, incrementally.
  *
  * State honesty at 100 TB: state is keyed by bucket, so it grows
  * with the corpus' distinct band keys; `maxBucket` bounds each
  * bucket's width (hot buckets stop accumulating — the same cap a
  * batch run would impose on pathological buckets), and a production
  * deployment adds a GroupStateTimeout so buckets idle past the
  * dedup horizon are evicted (kept NoTimeout here so replays are
  * deterministic). Candidates are CANDIDATES: the exact-verify join
  * stays a downstream batch/second stage, as in the batch
  * composition. A pair sharing several bands is emitted once per
  * shared band (the downstream verify dedups, same as the batch
  * path's distinct()).
  */
object DocStreams {

  case class BandRow(doc_id: Long, band: Int, key: Long)
  case class BucketState(ids: Seq[Long])
  case class Candidate(doc_id: Long, prior_id: Long, band: Int, key: Long)

  case class GramRow(doc_id: Long, n_tokens: Long, pos: Int, h: Long, h2: Long)
  case class GramSeen(seen: Boolean)
  case class DupHit(doc_id: Long, n_tokens: Long, pos: Int)

  /** (band, key) rows for each document — stateless projection
    * shared by the streaming gate and its batch-equivalence spec. */
  def bandRows(docs: DataFrame, idCol: String, textCol: String,
               k: Int, perms: Int, bands: Int): DataFrame = {
    // a non-integral id would cast to null and surface as an opaque
    // encoder NPE inside flatMapGroupsWithState — fail with a clear
    // message at plan time instead (schema is known for streams too)
    graft.pipeline.Packing.requireIntegralId(docs, idCol)
    GraftFunctions.register(docs.sparkSession)
    docs
      .withColumn("__ws", TextAnalysis.words(col(textCol)))
      .filter(size(col("__ws")) >= k)
      .withColumn("__sig", GraftFunctions.minhashSig(Dedup.shingleArray(k), perms))
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(Dedup.bandKeysExpr("__sig", perms, bands)).as(Seq("band", "key")))
  }

  /** Positional k-gram rows for span-level dedup — stateless
    * projection shared by [[dupGramHitsStream]], its batch comparator
    * [[dupGramHitsBatch]], and their equivalence spec. 128-bit keys
    * for the same reason as `Dedup.duplicateSpans`: a 64-bit collision
    * would flag (and downstream, cut) unique text. */
  def gramRows(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    graft.pipeline.Packing.requireIntegralId(docs, idCol)
    docs
      .withColumn("__ws", TextAnalysis.words(col(textCol)))
      .filter(size(col("__ws")) >= k)
      .select(col(idCol).cast("long").as("doc_id"),
        size(col("__ws")).cast("long").as("n_tokens"),
        posexplode(Dedup.positionalShingleArray(k)).as(Seq("pos", "__g")))
      .select(col("doc_id"), col("n_tokens"), col("pos"),
        xxhash64(col("__g")).as("h"), xxhash64(lit("g2"), col("__g")).as("h2"))
  }

  /** Incremental duplicate-span detection at ingest: emits a hit for
    * every k-gram occurrence whose gram was ALREADY SEEN in the stream
    * (an earlier micro-batch, an earlier document of the same batch,
    * or earlier in the same document — self-repeats count), i.e. the
    * prior-occurrence semantics a streaming pass can honestly decide
    * (the FIRST occurrence has already been admitted; a batch
    * compaction with `Dedup.duplicateSpans` reconciles it per epoch).
    * One flatMapGroupsWithState keyed by the 128-bit gram hash holding
    * a single boolean — the minimum state any exact incremental gram
    * gate can carry; hot grams cost the same one flag as rare ones.
    * Output: (doc_id, n_tokens, pos) hit rows; merging hits into spans
    * is per-doc downstream work (`Dedup`'s islands machinery), kept
    * out of the stream for the same reason the LSH gate emits
    * candidates, not verdicts. Batch ≡ stream is spec-pinned against
    * [[dupGramHitsBatch]] on a replayed corpus. */
  def dupGramHitsStream(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 8): DataFrame = {
    val rows = gramRows(docs, idCol, textCol, k).as(Encoders.product[GramRow])
    rows.groupByKey(r => (r.h, r.h2))(Encoders.product[(Long, Long)])
      .flatMapGroupsWithState[GramSeen, DupHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (_: (Long, Long), it: Iterator[GramRow], state: GroupState[GramSeen]) => {
          var seen = state.getOption.exists(_.seen)
          val out = List.newBuilder[DupHit]
          // (doc_id, pos) order keeps replays deterministic within a batch
          it.toArray.sortBy(r => (r.doc_id, r.pos)).foreach { r =>
            if (seen) out += DupHit(r.doc_id, r.n_tokens, r.pos)
            else seen = true
          }
          state.update(GramSeen(true))
          out.result().iterator
        })(Encoders.product[GramSeen], Encoders.product[DupHit])
      .toDF()
  }

  /** The batch comparator for [[dupGramHitsStream]]: an occurrence is
    * a hit iff it is not the first of its gram in (doc_id, pos) order
    * — exactly what the stream computes when the corpus is replayed in
    * that order. */
  def dupGramHitsBatch(docs: DataFrame, idCol: String, textCol: String,
                       k: Int = 8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("h", "h2").orderBy("doc_id", "pos")
    gramRows(docs, idCol, textCol, k)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") > 1)
      .select("doc_id", "n_tokens", "pos")
  }

  /** Streaming near-dup candidate gate. Output: (doc_id, prior_id,
    * band, key) for every band bucket an arriving doc shares with an
    * already-resident doc. Works on a readStream source (append mode)
    * and on static frames (batch flatMapGroupsWithState). */
  def nearDupCandidatesStream(docs: DataFrame, idCol: String, textCol: String,
                              k: Int = 3, perms: Int = 32, bands: Int = 8,
                              maxBucket: Int = 16): DataFrame = {
    require(maxBucket >= 1, s"maxBucket must be >= 1, got $maxBucket")
    val br = bandRows(docs, idCol, textCol, k, perms, bands)
      .as(Encoders.product[BandRow])
    br.groupByKey(r => (r.band, r.key))(Encoders.product[(Int, Long)])
      .flatMapGroupsWithState[BucketState, Candidate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (bucket: (Int, Long), rows: Iterator[BandRow], state: GroupState[BucketState]) => {
          var resident = state.getOption.map(_.ids).getOrElse(Seq.empty)
          val out = List.newBuilder[Candidate]
          // id order within the micro-batch keeps replays deterministic
          rows.toArray.sortBy(_.doc_id).foreach { r =>
            if (!resident.contains(r.doc_id)) {
              resident.foreach(p => out += Candidate(r.doc_id, p, bucket._1, bucket._2))
              if (resident.size < maxBucket) resident = resident :+ r.doc_id
            }
          }
          state.update(BucketState(resident))
          out.result().iterator
        })(Encoders.product[BucketState], Encoders.product[Candidate])
      .toDF()
  }
}
