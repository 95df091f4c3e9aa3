package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev main: per-query Spark-job/stage/task census — the fixed-cost
  * profile the sf0.1 bench is dominated by (the corpus there is ~15 MB,
  * so wall time is mostly scheduling: driver round-trips × per-job
  * launch cost, not bytes). For each registered query (or the given
  * subset) it runs the Bench action once in this JVM and reports
  * jobs/stages/tasks plus the summed executor task time; a query whose
  * wall is several× its task time is paying serial driver overhead
  * (loop rounds, checkpoint materializations, convergence probes) —
  * the cost class that does NOT shrink with cluster size.
  *
  *   SPARK_GRAFT_CPUS=32 tools/runjvm.sh graft.JobProfile \
  *     /root/testdata/sf0.1 q_dup_passages,q_dedup_editdist
  *
  * `-v` additionally attributes each job to its graft call site (first
  * graft frame of the lead stage's stack) and prints the longest jobs
  * and driver-idle gaps. WARNING: -v PERTURBS WALLS — measured 6× task
  * -time inflation on the SA family vs the same run without it
  * (mechanism not chased; local mode shares the JVM with executors).
  * Use -v for STRUCTURE (job counts, sites); take walls from
  * non-verbose runs or graft.Bench.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val verbose = args.contains("-v")
    val rest = args.filterNot(_ == "-v")
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.1")
    val only = rest.drop(1).headOption.map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    val jobEnd = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    // per-stage census: (stageId, numTasks, wallMs, summed task ms) —
    // the single-task-heavy-stage detector (a long stage with 1 task
    // while 31 cores idle is the AQE-coalesced CPU-dense shape)
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1
        if (verbose) {
          // first graft frame in the job's lead stage call stack — the
          // library line that caused the action (callSite.short is not
          // propagated onto SQL-execution job properties)
          val site = j.stageInfos.headOption.map(_.details)
            .flatMap(_.split('\n').find(l =>
              l.contains("graft.") && !l.contains("JobProfile")))
            .map(_.trim).getOrElse("?")
          jobLog.add((j.jobId, System.currentTimeMillis(), site))
        }
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobEnd.put(j.jobId, System.currentTimeMillis())
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        if (verbose) {
          val i = s.stageInfo
          val wall = (for (a <- i.submissionTime; b <- i.completionTime)
            yield b - a).getOrElse(0L)
          val site = i.details.split('\n')
            .find(l => l.contains("graft.") && !l.contains("JobProfile"))
            .map(_.trim).getOrElse(i.name.take(60))
          stageLog.add((i.stageId, i.numTasks, wall,
            i.taskMetrics.executorRunTime, site.take(90)))
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) taskMs += t.taskInfo.duration
    })

    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      spark.catalog.clearCache()
      graft.dedup.Dedup.releaseCaches()
      SharedFrames.release(keep = tag =>
        SparkEntry.sharedFamilies.get(tag).exists(name.startsWith))
      System.gc()
      jobs = 0; stages = 0; tasks = 0; taskMs = 0L; jobLog.clear(); stageLog.clear()
      val t0 = System.nanoTime()
      val res = try { fn(spark, sfDir).count(); "ok" }
        catch { case t: Throwable => t.getClass.getSimpleName }
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async; give it a beat to drain before reading
      Thread.sleep(300)
      // Locale.ROOT formatting: the f-interpolator uses the default
      // locale, and a comma-decimal host would corrupt the JSON line —
      // the exact pitfall Bench.fmt fixed (r18 ADVICE item 2)
      println(String.format(java.util.Locale.ROOT,
        """{"query":"%s","wall_sec":%.2f,"jobs":%d,"stages":%d,"tasks":%d,"task_time_sec":%.2f,"status":"%s"}""",
        name, Double.box(wall), Int.box(jobs), Int.box(stages), Int.box(tasks),
        Double.box(taskMs / 1e3), res))
      if (verbose) {
        import scala.jdk.CollectionConverters._
        val entries = jobLog.asScala.toSeq.sortBy(_._1)
        // per-site census plus inter-job gaps (driver-side dead time)
        entries.groupBy(_._3).toSeq.sortBy(-_._2.size).foreach { case (site, es) =>
          println(s"  site x${es.size}: $site")
        }
        // the 10 longest jobs (duration = jobEnd - jobStart)
        val timed = entries.map { case (id, st0, site) =>
          (id, st0, jobEnd.getOrDefault(id, st0), site)
        }
        timed.sortBy(e => e._2 - e._3).take(10).foreach { case (id, st0, en, site) =>
          println(f"  job $id%3d ${(en - st0) / 1e3}%8.2fs  $site")
        }
        // driver idle = wall minus the UNION of [start, end] job
        // intervals (jobs overlap under concurrent actions, so
        // jobId-ordered gaps are meaningless and can go negative —
        // r18 ADVICE item 3)
        val iv = timed.map(e => (e._2, math.max(e._2, e._3))).sortBy(_._1)
        var covered = 0L; var cursor = 0L
        iv.foreach { case (s, e) =>
          if (cursor == 0L) { covered += e - s; cursor = e }
          else if (s >= cursor) { covered += e - s; cursor = e }
          else if (e > cursor) { covered += e - cursor; cursor = e }
        }
        if (iv.nonEmpty) {
          val span = cursor - iv.head._1 // cursor = max covered end
          println(s"  driver idle (no job) ms: " +
            s"${math.max(0L, span - covered)} of span $span")
        }
        // single-task-heavy-stage detector: stages >= 200 ms wall,
        // widest first — a multi-second 1-task row here is the
        // AQE-coalesced CPU-dense shape (guide §2 partition-by-work)
        val sl = stageLog.asScala.toSeq.filter(_._3 >= 200).sortBy(-_._3).take(15)
        sl.foreach { case (sid, nt, wms, trun, nm) =>
          println(f"  stage $sid%4d tasks=$nt%3d wall=${wms / 1e3}%7.2fs taskRun=${trun / 1e3}%7.2fs  $nm")
        }
      }
    }
    spark.stop()
  }
}
