package graft

import graft.operators.{AsOf, MeanMax, Stats}
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
    spark.stop()
  }
}
