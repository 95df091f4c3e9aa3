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
