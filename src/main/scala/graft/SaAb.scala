package graft

import org.apache.spark.sql.functions._

/** Dev main: suffix-array knob A-B.
  *   tools/runjvm.sh graft.SaAb parity SF_DIR        — baseWidth 1 vs 4 extents equality
  *   tools/runjvm.sh graft.SaAb bench SF_DIR W [K]   — time q_dup_spans_sa+q_dup_passages family at baseWidth W, arity K (default 2)
  *   tools/runjvm.sh graft.SaAb copart SF_DIR on|off [K] — time the family with the r14 co-partitioned doubling loop on/off (arity K, default 2)
  *   tools/runjvm.sh graft.SaAb slowdecay N on|off   — time repeatExtents on the slow-decay boilerplate corpus (N docs), copart on/off
  */
object SaAb {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val dir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local("graft-sa-ab", cpus)
    spark.sparkContext.setLogLevel("WARN")
    lazy val docs = Tables.documents(spark, dir) // not a path in slowdecay mode
    mode match {
      case "slowdecay" =>
        // SLOW-DECAY corpus: every doc = one shared 1000-token prefix +
        // 26 doc-unique 32-char tail tokens (distinct texts — the
        // exact-dup collapse routes DIRECT). Every shared-prefix suffix
        // stays ambiguous until span covers its remaining shared run,
        // so the pending set decays over ~7 doubling rounds instead of
        // collapsing after round 0 — the regime where the join loop
        // pays a corpus-sized partner-lookup exchange per round. This
        // is the boilerplate-heavy pre-dedup web-scrape shape the
        // ExactSubstr operator exists for.
        val n = args(1).toLong // arg slot doubles as `dir` (unused here)
        val knob = args(2) match {
          case "on" => "true"; case "off" => "false"; case k => k // "auto"
        }
        spark.conf.set(graft.dedup.SuffixSpans.CoPartConfKey, knob)
        val on = knob
        val shared = (1 to 1000).map(i => s"p$i").mkString(" ")
        val sdocs = spark.range(n).select(col("id").as("doc_id"),
          concat(lit(shared + " "), concat_ws(" ",
            (0 until 26).map(j => md5(concat(col("id"), lit(s":$j")))): _*)).as("text"))
        val t0 = System.nanoTime()
        val rows = graft.dedup.SuffixSpans.repeatExtents(sdocs, "doc_id", "text",
          minLen = 8).count()
        val t1 = System.nanoTime()
        // the switch fact is only defined on the adaptive path — forced
        // modes ("true"/"false") never write the test-only var
        val switched = if (on == "auto")
          s" switched=${graft.dedup.SuffixSpans.lastSwitchedToCoPart}" else ""
        println(f"[saab] slowdecay copart=$on n=$n extents_rows=$rows time=${(t1 - t0) / 1e9}%.1f s$switched")
      case "copart" =>
        val on = args(2) == "on"
        val k = if (args.length > 3) args(3).toInt else 2
        spark.conf.set(graft.dedup.SuffixSpans.CoPartConfKey, on.toString)
        val t0 = System.nanoTime()
        val n1 = graft.dedup.SuffixSpans.duplicateSpansExact(docs, "doc_id", "text",
          minLen = 5, buildMinLen = 5, arity = k).count()
        val t1 = System.nanoTime()
        val n2 = graft.dedup.SuffixSpans.longestPassages(docs, "doc_id", "text",
          minLen = 8, topN = 20, buildMinLen = 5, arity = k).count()
        val t2 = System.nanoTime()
        println(f"[saab] copart=$on arity=$k spans_sa=${(t1 - t0) / 1e9}%.1f s (rows=$n1) passages=${(t2 - t1) / 1e9}%.1f s (rows=$n2) family=${(t2 - t0) / 1e9}%.1f s")
      case "parity" =>
        val a = graft.dedup.SuffixSpans.repeatExtents(docs, "doc_id", "text",
          minLen = 5, baseWidth = 1)
        // separate entry impossible (width excluded from key) — release between
        val ca = a.orderBy("doc_id", "pos").collect()
        SharedFrames.release()
        graft.dedup.Dedup.releaseCaches()
        val b = graft.dedup.SuffixSpans.repeatExtents(docs, "doc_id", "text",
          minLen = 5, baseWidth = 4)
        val cb = b.orderBy("doc_id", "pos").collect()
        println(s"[saab] width1 rows=${ca.length} width4 rows=${cb.length} equal=${ca.sameElements(cb)}")
      case "bench" =>
        val w = args(2).toInt
        val k = if (args.length > 3) args(3).toInt else 2
        val t0 = System.nanoTime()
        val n1 = graft.dedup.SuffixSpans.duplicateSpansExact(docs, "doc_id", "text",
          minLen = 5, buildMinLen = 5, baseWidth = w, arity = k).count()
        val t1 = System.nanoTime()
        val n2 = graft.dedup.SuffixSpans.longestPassages(docs, "doc_id", "text",
          minLen = 8, topN = 20, buildMinLen = 5, baseWidth = w, arity = k).count()
        val t2 = System.nanoTime()
        println(f"[saab] baseWidth=$w arity=$k spans_sa=${(t1 - t0) / 1e9}%.1f s (rows=$n1) passages=${(t2 - t1) / 1e9}%.1f s (rows=$n2) family=${(t2 - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
