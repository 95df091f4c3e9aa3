package graft

import org.apache.spark.sql.SparkSession

/** Session factory with graft's scale-oriented defaults.
  *
  * Local testing runs `local[32]`; the same configs are what we'd set on a
  * real cluster (AQE handles runtime re-planning: partition coalescing,
  * skew-join splitting, broadcast demotion).
  */
object GraftSession {
  def builder(appName: String = "graft", cpus: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Shuffle files are cleaned only when the driver GCs the
      // ShuffleDependency and the ContextCleaner notices; Spark's
      // backstop GC defaults to 30 MINUTES, so an iterative job whose
      // driver heap never pressures GC (the SA doubling loop, the
      // survivor loop) accumulates every superseded round's shuffle
      // on disk. Checkpoints.free drops superseded CACHE blocks
      // eagerly, but shuffle cleanup has no public API — this
      // interval is the sanctioned lever. Measured: the sf100 SA run
      // still hit the disk guard post-free at ~50 GB of mostly dead
      // shuffle files (BENCH_sa_sf100_postfix_r18.json); 90 s bounds
      // dead-shuffle residency to ~2 rounds at a worst-case full-GC
      // cost of ~1-3 s/min, under the measured host epoch noise.
      .config("spark.cleaner.periodicGC.interval", "90s")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")

  def local(appName: String = "graft", cpus: Int = 32): SparkSession = {
    val s = builder(appName, cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
