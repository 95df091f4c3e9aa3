package graft

import graft.dedup.Dedup
import graft.operators.{AsOf, GlobalOrder, MeanMax, Stats}
import graft.similarity.Cosine
import org.apache.spark.sql.functions._

/** Scale smoke: generate a 10M-row events-shaped table with
  * `spark.range` (no testdata writes) and run the heavy keyed
  * operators — validates the partition/shuffle shapes beyond the sf0.1
  * fixtures (per-key windows, co-partitioned as-of merge, two-pass
  * weighted quantile) and prints one timing line each.
  *
  *   sbt "runMain graft.ScaleSmoke [rows] [keys]"
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val keys = if (args.length > 1) args(1).toInt else 10000
    val spark = GraftSession.local("graft-scale-smoke", cpus = 16)
    import spark.implicits._

    val events = spark.range(rows).select(
      (col("id") % keys).as("user_id"),
      (col("id") / keys * 7 + pmod(xxhash64(col("id")), lit(5))).cast("double").as("eps"),
      (col("id") % keys).cast("long").as("k"),
      pmod(xxhash64(col("id"), lit(1)), lit(1000)).cast("double").as("value"),
      col("id").as("event_id"))
      .cache()
    events.count()

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scale-smoke] $name%-20s rows=$n%-10d ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    timed("meanmax") {
      MeanMax.meanMax(events.withColumn("eps", col("eps").cast("long")),
        "user_id", "eps", "value", Seq(60L, 600L, 3600L)).count()
    }
    timed("asof_join") {
      AsOf.forwardJoin(events, "user_id", "eps", "value", "event_id", 60.0).count()
    }
    timed("weighted_quantile") {
      Stats.weightedQuantile(events, "value", "user_id", Seq(0.25, 0.5, 0.75)).count()
    }
    timed("group_agg") {
      events.groupBy("user_id").agg(count(lit(1)), avg("value"), max("eps")).count()
    }
    timed("global_prev") {
      // boundary-exchange global lag over the full event set
      GlobalOrder.withPrev(events.select(col("eps"), col("value")),
        Seq(col("eps")), Seq("value")).count()
    }
    timed("blocked_pairs") {
      // 4k synthetic 16-dim vectors → ~8M pairs through the blocked
      // triangular equi-join (the exact near-dup plan shape)
      val vecs = spark.range(4000).select(col("id").as("vec_id"),
        expr("transform(sequence(1, 16), i -> cast(pmod(xxhash64(id, i), 1000) as float) / 1000.0)")
          .as("embedding"))
      Cosine.nearDupPairs(vecs, "vec_id", "embedding", 0.99).count()
    }
    timed("survivors_1m") {
      // 1M ids, 500k candidate pairs → label propagation volume check
      val pairs = spark.range(500000).select((col("id") * 2).as("doc1"), (col("id") * 2 + 1).as("doc2"))
      val ids = spark.range(1000000).toDF("doc_id")
      Dedup.survivors(pairs, ids, "doc_id").count()
    }
    timed("interp_merge_10m") {
      // co-partitioned two-pointer interpolation: 10M base rows,
      // 1M probes across the same key space
      val probes = spark.range(rows / 10).select(
        (col("id") % keys).as("user_id"),
        (col("id") / keys * 70 + 3).cast("double").as("px"))
      graft.operators.Lookup.interpolatedMerge(
        events.select(col("user_id"), col("eps"), col("value")),
        probes, "user_id", "eps", "value", "px").count()
    }
    timed("banded_ngram_200k") {
      // 200k synthetic docs (30 words over a 50k vocab + 10% near-dup
      // tails) through the banded MinHash→exact-verify composition —
      // signature aggregation, (band, bh) equi-join, and full-set
      // verify at membership volumes the sf0.1 fixtures never reach
      val docs = spark.range(200000).select(col("id").as("doc_id"),
        expr("""concat_ws(' ', transform(sequence(1, 30),
                 i -> concat('w', pmod(xxhash64(CASE WHEN id % 10 = 0 AND i > 27
                                                     THEN id - 5 ELSE id END, i), 50000))))""")
          .as("text"))
      Dedup.ngramJaccardPairsBanded(docs, "doc_id", "text", k = 3, threshold = 0.8).count()
    }
    timed("bloom_1m_x_10m") {
      // 1M-item bloom (fpp 1e-8, ~5.7 MB bits) probed by 10M corpus
      // hashes — the decontamination filter at volumes where the exact
      // broadcast set would already be hundreds of MB of strings
      val bench = spark.range(1000000).select(xxhash64(col("id"), lit(7)).as("h"))
      val bloom = graft.functions.GraftBloom.build(bench, "h", 1000000L, 1e-8)
      val probes = spark.range(rows).select(xxhash64(col("id"), lit(8)).as("h"))
      // disjoint hash domains → ~everything misses; count forces the probe
      probes.filter(!bloom.mightContain(col("h"))).count()
    }
    events.unpersist()
    timed("banded_embed_100k") {
      // 100k 64-dim vectors through the seed-derived hyperplane kernel
      // path (192 bits × 16 bands): candidate equi-join + exact verify
      val vecs = spark.range(100000).select(col("id").as("vec_id"),
        expr("transform(sequence(1, 64), i -> cast(pmod(xxhash64(id, i), 2000) as double) / 1000.0 - 1.0)")
          .as("embedding"))
      Cosine.lshNearDupPairs(vecs, "vec_id", "embedding", 0.9, bits = 192, bands = 16).count()
    }
    spark.stop()
  }
}
