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
  * per-executor number a cluster-rate estimate multiplies out from. */
object StreamBench {

  /** events/sec for `dedupStream` and `sessionizeStream` over the
    * sf-dir events table, fed in `batchSize`-row MemoryStream batches. */
  def rates(spark: SparkSession, sfDir: String, batchSize: Int = 20000): Map[String, Double] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ev = Tables.events(spark, sfDir)
      .select(col("user_id").cast("long"), col("eps_us").cast("long"),
        col("value").cast("double"))
      .as[(Long, Long, Double)].collect()

    def run(name: String)(build: () => (Seq[Array[(Long, Long, Double)]] => Unit, () => Unit)): Double = {
      val batches = ev.grouped(batchSize).toSeq
      val (feed, stop) = build()
      val t0 = System.nanoTime()
      feed(batches)
      val secs = (System.nanoTime() - t0) / 1e9
      stop()
      ev.length / secs
    }

    val dedupRate = run("dedup") { () =>
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

    val sessRate = run("sessionize") { () =>
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
  }
}
