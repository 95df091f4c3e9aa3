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
      // Dead-shuffle residency in iterative builds (the r18 sf100 SA
      // lesson, BENCH_sa_sf100_postfix_r18.json) is now bounded INSIDE
      // the loops themselves: graft.LoopGc forces a throttled driver
      // GC about once a minute while a doubling/survivors/LCP loop is
      // running, so the bound holds in EVERY session (graft.Bench's
      // own session never had the r18 session-global
      // spark.cleaner.periodicGC.interval=90s) and short queries never
      // inherit forced-full-GC risk for a residency problem only long
      // builds have (r18 verdict item 1).
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")

  def local(appName: String = "graft", cpus: Int = 32): SparkSession = {
    val s = builder(appName, cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
