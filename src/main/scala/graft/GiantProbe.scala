package graft

import org.apache.spark.sql.functions._

/** Dev main: giant-key block-split diagnosis on the adversarial60
  * corpus — prints the giantKeys frame, the hotKeys threshold inputs,
  * and the verified-join physical plan. */
object GiantProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(15000L)
    val spark = GraftSession.local("graft-giant-probe", 8)
    spark.sparkContext.setLogLevel("WARN")
    val docs = EditDistStress.adversarial60(spark, n)
    val st = graft.dedup.EditDistance.stages(docs, "doc_id", "text",
      maxFrac = 0.1, headChars = 80, extraSegs = 11)
    val gk = st("giantKeys")
    println("[probe] hotKeys rows=" + st("hotKeys").count())
    st("hotKeys").orderBy(desc("__df")).show(10, false)
    println("[probe] giantKeys:")
    gk.show(30, false)
    println("[probe] verified plan:")
    st("verified").explain("formatted")
    spark.stop()
  }
}
