package graft

import org.apache.spark.sql.functions._

/** Dev main: size the editdist pipeline's stages at SPARK_GRAFT_SF_DIR.
  * Unlike its retired predecessor (which inlined copies of the
  * operator's frames and drifted from them twice in one round), this
  * tool profiles [[graft.dedup.EditDistance.stages]] — the SHIPPED
  * construction — so it cannot disagree with the operator.
  *
  * Prints one line per stage: row count + wall seconds, then the top
  * per-key document frequencies on each side of the candidate join
  * (the number that decides whether the candidate volume is linear). */
object DebugEditDist {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local("graft-debug-editdist", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    val extraSegs = sys.env.getOrElse("SPARK_GRAFT_ED_EXTRASEGS", "2").toInt
    val hotDfCap = sys.env.getOrElse("SPARK_GRAFT_ED_HOTDFCAP", "256").toInt
    println(s"[cfg] extraSegs=$extraSegs hotDfCap=$hotDfCap")
    val st = graft.dedup.EditDistance.stages(
      Tables.documents(spark, sfDir), "doc_id", "text",
      maxFrac = 0.1, headChars = 80,
      extraSegs = extraSegs, hotDfCap = hotDfCap)

    def timeCount(name: String): Long = {
      val t0 = System.nanoTime()
      val n = st(name).count()
      println(f"[stage] $name%-10s rows=$n%12d  ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      n
    }
    // SPARK_GRAFT_ED_ONLY=result: time just the end-to-end result (the
    // config A-B loop); default profiles every stage + key df tops
    if (!sys.env.get("SPARK_GRAFT_ED_ONLY").contains("result")) {
      Seq("heads", "segs", "probe", "hotKeys", "dropSet", "segsIndexed").foreach(timeCount)
      // per-key df on each side of the candidate equi-join (the join
      // key is the 64-bit xxhash64(len, seg, content) — group on it)
      for (side <- Seq("segsIndexed", "probe")) {
        val top = st(side).groupBy("__k")
          .agg(count(lit(1)).as("df")).orderBy(desc("df")).limit(8).collect()
        println(s"[topdf] $side: " + top.map(r =>
          s"${r.get(0)}=${r.get(1)}").mkString(" "))
      }
    }
    timeCount("result")
    spark.stop()
  }
}
