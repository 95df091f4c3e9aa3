package graft.streaming

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Streaming throughput measurement (SURVEY.md §2 #52/#63): drives the
  * events table through MemoryStream in fixed-size batches and reports
  * events/sec for the watermark-bounded exact dedup and the stateful
  * sessionization — the micro-batch rate a single node sustains, the
  * per-executor number a cluster-rate estimate multiplies out from.
  *
  * The feeder collects at most `maxEvents` rows to the driver — the
  * harness itself must not OOM when pointed at a bigger scale factor;
  * a throughput measurement doesn't need more than a few batches. */
object StreamBench {

  private val RocksDB =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** events/sec for `dedupStream` and `sessionizeStream` over the
    * sf-dir events table, fed in `batchSize`-row MemoryStream batches.
    * `rocksdb` switches the state store provider for these queries
    * (set at query start, restored after). */
  def rates(spark: SparkSession, sfDir: String, batchSize: Int = 20000,
            maxEvents: Int = 200000, rocksdb: Boolean = false): Map[String, Double] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ev = Tables.events(spark, sfDir)
      .select(col("user_id").cast("long"), col("eps_us").cast("long"),
        col("value").cast("double"))
      .limit(maxEvents)
      .as[(Long, Long, Double)].collect()

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    if (rocksdb) spark.conf.set(providerKey, RocksDB)

    def run(build: () => (Seq[Array[(Long, Long, Double)]] => Unit, () => Unit)): Double = {
      val batches = ev.grouped(batchSize).toSeq
      val (feed, stop) = build()
      val t0 = System.nanoTime()
      feed(batches)
      val secs = (System.nanoTime() - t0) / 1e9
      stop()
      ev.length / secs
    }

    try {
      val dedupRate = run { () =>
        val mem = MemoryStream[(Timestamp, Long, Double)]
        val q = EventStreams.dedupStream(
            mem.toDF().toDF("ts", "user_id", "value"), "value", "ts")
          .writeStream.format("noop").outputMode("append").start()
        (batches => {
          batches.foreach { b =>
            mem.addData(b.map { case (u, e, v) => (new Timestamp(e / 1000), u, v) })
            q.processAllAvailable()
          }
        }, () => q.stop())
      }

      val sessRate = run { () =>
        val mem = MemoryStream[(Long, Long, Double)]
        val q = EventStreams.sessionizeStream(
            mem.toDF().toDF("user_id", "eps_us", "value"), gapMs = 3600000L)
          .writeStream.format("noop").outputMode("append").start()
        (batches => {
          batches.foreach { b => mem.addData(b); q.processAllAvailable() }
        }, () => q.stop())
      }

      Map("dedup_stream_events_per_sec" -> dedupRate,
        "sessionize_stream_events_per_sec" -> sessRate)
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  /** docs/sec for the streaming sequence packer (`Packing.packStream`)
    * over the sf-dir documents table, fed in `batchSize`-doc
    * MemoryStream batches — the ingest rate of a pack-as-you-crawl
    * pipeline stage. Per-shard state is one long, so the rate is
    * tokenization- and micro-batch-overhead-bound, not state-bound. */
  def packRate(spark: SparkSession, sfDir: String, batchSize: Int = 2000,
               maxDocs: Int = 20000): Double = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("long"), col("text"))
      .limit(maxDocs)
      .as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)]
    val q = graft.pipeline.Packing.packStream(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
        budget = 2048, shards = 32)
      .writeStream.format("noop").outputMode("append").start()
    val t0 = System.nanoTime()
    docs.grouped(batchSize).foreach { b =>
      mem.addData(b.toIndexedSeq); q.processAllAvailable()
    }
    val secs = (System.nanoTime() - t0) / 1e9
    q.stop()
    docs.length / secs
  }

  /** Throughput curve across micro-batch size and state-store backend —
    * the round-3 rates (~15k/28k ev/s at 20k-row batches) are
    * micro-batch-latency-bound, so the interesting axes are batch size
    * (amortizes per-batch planning/commit overhead) and the state
    * store (HDFS-backed heap map vs RocksDB). Keys:
    * `<op>_<batch>[_rocksdb]_events_per_sec`. */
  def curve(spark: SparkSession, sfDir: String): Map[String, Double] = {
    def tag(m: Map[String, Double], suffix: String): Map[String, Double] =
      m.map { case (k, v) => k.replace("_stream_events_per_sec", suffix) -> v }
    tag(rates(spark, sfDir, batchSize = 20000), "_20k_events_per_sec") ++
      tag(rates(spark, sfDir, batchSize = 100000), "_100k_events_per_sec") ++
      tag(rates(spark, sfDir, batchSize = 100000, rocksdb = true), "_100k_rocksdb_events_per_sec") ++
      Map("pack_2k_docs_per_sec" -> packRate(spark, sfDir, batchSize = 2000))
  }
}
