package graft

import graft.dedup.Dedup
import graft.streaming.DocStreams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming near-dup candidate gate (SURVEY.md §2 #74). */
class DocStreamsSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def pairsOf(rows: Array[org.apache.spark.sql.Row]): Set[(Long, Long)] =
    rows.map { r =>
      val (a, b) = (r.getAs[Long]("doc_id"), r.getAs[Long]("prior_id"))
      (math.min(a, b), math.max(a, b))
    }.toSet

  test("streaming candidates equal the batch band equi-join across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1)
    val (b1, b2) = docs.splitAt(docs.length / 2)

    val mem = MemoryStream[(Long, String)]
    val gate = DocStreams.nearDupCandidatesStream(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      k = 3, perms = 32, bands = 8, maxBucket = 64)
    val q = gate.writeStream.format("memory").queryName("neardup_gate")
      .outputMode("append").start()
    try {
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq); q.processAllAvailable()
      val streamed = pairsOf(spark.table("neardup_gate").collect())
      val batch = Dedup.bandPairs(
          Dedup.minhashSignatures(docs.toSeq.toDF("doc_id", "text"),
            "doc_id", "text", k = 3, perms = 32),
          "doc_id", perms = 32, bands = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty) // testdata contains planted near-dups
    } finally q.stop()
  }

  test("bucket cap bounds state and emissions on a pathological hot bucket") {
    // 12 identical docs → every band bucket is hot; cap 4 residents
    val dup = (1L to 12L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val out = DocStreams.nearDupCandidatesStream(
        dup, "doc_id", "text", k = 3, perms = 32, bands = 8, maxBucket = 4)
      .collect()
    // residents per bucket are the first 4 ids: no prior_id above 4
    assert(out.forall(_.getAs[Long]("prior_id") <= 4L))
    // per band: arrivals 2..5 emit (i-1) pairs, arrivals 6..12 emit 4
    val perBand = out.groupBy(_.getAs[Int]("band")).map(_._2.length)
    assert(perBand.forall(_ == (1 + 2 + 3) + 4 * 8))
  }

  test("stateless ingest gate: batch and streaming outputs are row-identical") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.pipeline.CorpusPipeline
    val bench = Seq((0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val bloom = graft.pipeline.Curation.shingleBloom(bench, "text", k = 5, fpp = 1e-8)
    val good = "plainly normal sentence with enough distinct words to pass the gate fine"
    val docs = Seq(
      (1L, good, "de"),                                     // survives
      (2L, "too short", "de"),                              // quality-dropped
      (3L, good + " extra tokens appended here", "en"),     // mixture-dropped (en 0%)
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi", "de")
    ).toDF("doc_id", "text", "lang")                        // contaminated
    val cfg = CorpusPipeline.GateConfig(minWords = 5, shingleK = 5,
      maxContamination = 0.2, pctByGroup = Map("en" -> 0), defaultPct = 100)

    val batchOut = CorpusPipeline.ingestGate(docs, "doc_id", "text", "lang", bloom, cfg)
      .collect().map(_.getLong(0)).toSet
    assert(batchOut == Set(1L))

    // scrubPii stays a stateless projection and survivors carry the
    // scrubbed text (the text training would see)
    val piiDocs = Seq((7L, good + " mail x@y.io now", "de")).toDF("doc_id", "text", "lang")
    val scrubbed = CorpusPipeline.ingestGate(piiDocs, "doc_id", "text", "lang", bloom,
        cfg.copy(scrubPii = true))
      .collect()
    assert(scrubbed.length == 1)
    val t = scrubbed.head.getAs[String]("text")
    assert(t.contains("[EMAIL]") && !t.contains("x@y.io"))

    val mem = MemoryStream[(Long, String, String)]
    val sq = CorpusPipeline.ingestGate(
        mem.toDF().toDF("doc_id", "text", "lang"), "doc_id", "text", "lang", bloom, cfg)
      .writeStream.format("memory").queryName("ingest_gate").outputMode("append").start()
    try {
      mem.addData((1L, good, "de"), (2L, "too short", "de"))
      sq.processAllAvailable()
      mem.addData((3L, good + " extra tokens appended here", "en"),
        (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi", "de"))
      sq.processAllAvailable()
      val streamOut = spark.table("ingest_gate").collect().map(_.getLong(0)).toSet
      assert(streamOut == batchOut)
      // the whole gate is stateless: no state operator in the executed
      // streaming plan
      assert(sq.lastProgress.stateOperators.isEmpty)
    } finally sq.stop()
  }

  test("incremental span-dedup: streaming gram hits equal the batch prior-occurrence set") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1)
    val (b1, rest) = docs.splitAt(docs.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)

    val mem = MemoryStream[(Long, String)]
    val gate = DocStreams.dupGramHitsStream(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", k = 8)
    val q = gate.writeStream.format("memory").queryName("span_gate")
      .outputMode("append").start()
    try {
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq); q.processAllAvailable()
      mem.addData(b3.toIndexedSeq); q.processAllAvailable()
      val streamed = spark.table("span_gate").collect()
        .map(r => (r.getLong(0), r.getInt(2))).toSet
      val batch = DocStreams.dupGramHitsBatch(
          docs.toSeq.toDF("doc_id", "text"), "doc_id", "text", k = 8)
        .collect().map(r => (r.getLong(0), r.getInt(2))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty, "fixture corpus contains duplicated 8-grams")
    } finally q.stop()
  }

  test("epoch-bloom span gate: stateless, streaming-legal, equals duplicateSpans on its own corpus") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val bloom = Dedup.duplicatedGramBloom(docs, "doc_id", "text", k = 8, fpp = 1e-10)

    // batch: per-row stats restricted to flagged docs == the relational
    // span pipeline (same corpus, same k — bloom fp ~ 1e-10 · grams ≈ 0)
    val perRow = Dedup.spanStatsPerRow(docs, bloom, "doc_id", "text", k = 8)
      .filter(col("dup_fraction") > 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    val batch = Dedup.duplicateSpans(docs, "doc_id", "text", k = 8, minCount = 2)
      .select("doc_id", "n_tokens", "dup_tokens", "n_spans", "dup_fraction")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(perRow == batch)
    assert(perRow.nonEmpty)

    // stream: identical rows, and the executed plan carries NO state
    val rows = docs.as[(Long, String)].collect().sortBy(_._1)
    val mem = MemoryStream[(Long, String)]
    val sq = Dedup.spanStatsPerRow(mem.toDF().toDF("doc_id", "text"),
        bloom, "doc_id", "text", k = 8)
      .writeStream.format("memory").queryName("span_bloom_gate")
      .outputMode("append").start()
    try {
      val (h1, h2) = rows.splitAt(rows.length / 2)
      mem.addData(h1.toIndexedSeq); sq.processAllAvailable()
      mem.addData(h2.toIndexedSeq); sq.processAllAvailable()
      val streamed = spark.table("span_bloom_gate")
        .filter(col("dup_fraction") > 0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSet
      assert(streamed == batch)
      assert(sq.lastProgress.stateOperators.isEmpty)
    } finally sq.stop()
  }

  test("zero-token and sub-k docs pass the gate without state or candidates") {
    val tiny = Seq((1L, ""), (2L, "one two"), (3L, "one two")).toDF("doc_id", "text")
    val out = DocStreams.nearDupCandidatesStream(
      tiny, "doc_id", "text", k = 3, perms = 32, bands = 8)
    assert(out.count() == 0) // no doc has >= 3 words → no shingles, no buckets
  }
}
