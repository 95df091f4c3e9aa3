package graft

/** Dev main: dump formatted physical plans for the headline queries —
  * the scale audit (PushedFilters reaching scans, broadcast joins on
  * dims, whole-stage codegen spans, no stray global sorts).
  *
  *   sbt "runMain graft.Explain /root/testdata/sf0.001 q_lookup_join ..."
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local("graft-explain", cpus = 4)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try SparkEntry.queries(n)(spark, dir).explain("formatted")
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
