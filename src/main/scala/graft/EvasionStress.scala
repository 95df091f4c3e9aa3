package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev main: the editdist MIXED-LENGTH giant-key evasion (VERDICT r13
  * item 2 — the one adversarial shape the r12 giant-key detector was
  * documented to miss, `EditDistance.scala` giant-split comment).
  *
  * The shape, in the operator's own geometry (maxFrac 0.1, headChars
  * 80, extraSegs 2): SHORT heads of length 72 partition into c = 11
  * segments (olenMax(72) = 80 ⇒ d = 8), but a length-72 probe's
  * enumeration truncates at τ+1+extraSegs = floor(7.2)+3 = 10 — so
  * segment index 11 (the last 7 chars) is enumerated ONLY by probes of
  * length 80 (τ = 8 ⇒ bound 11). Give every short head the same
  * 7-char boilerplate TAIL and plant a modest cohort of length-80
  * heads carrying that boilerplate at the same offset:
  *   - segs-df of the key (72, seg 11, boiler) ≈ n_short (every short
  *     head indexes it);
  *   - probe-df ≈ n_long, kept BELOW the clamped hot threshold
  *     (256 at this corpus size) — the key evades hotKeys, hence both
  *     the top-spare drop and the hot-anchored giant-key block split;
  *   - the candidate join then streams a·b ≈ n_short·n_long rows
  *     through ONE hash partition (AQE cannot split inside a key).
  * True pairs are closed-form: every 50th short head is its
  * predecessor with 2 substitutions inside the random region —
  * n_short/50 pairs at distance 2; everything else is random hex
  * (cross distances ≫ budget) — so output exactness is checked
  * per run while the cost profile shows whether the undetected giant
  * serializes.
  *
  * The r14 fix measured by this main: segs-side giant detection
  * (`spark.graft.editdistSegsGiant`, EditDistance.scala) — candidates
  * from the sampled segs df alone, probe-df recounted through a
  * broadcast-pruned aggregation, product rule as usual. `off` is
  * bit-identical to the pre-r14 code path.
  *
  *   tools/runjvm.sh graft.EvasionStress [nShort] [nLong]
  */
object EvasionStress {

  /** nLong length-80 heads (ids 0..nLong−1), then nShort length-72
    * heads. Every SHORT head ends with the 7-char boilerplate (chars
    * 66..72 — its segment 11); every LONG head carries the boilerplate
    * at chars 74..80, which is exactly where a length-80 probe
    * enumerates segment 11 of the length-72 partition: at i = 11 the
    * admissible shift collapses to s = Δ = 8 (only τ−i+1+spare = 0
    * edits may follow the last segment, so all 8 net indels precede
    * it), and the image position is segP(72,11) + 8 = 74. Shorts at
    * (id − nLong) % 50 == 49 copy their predecessor's random region
    * with 2 'Z' substitutions. True pairs: nShort/50, each at distance
    * 2 (for nShort a multiple of 50). The boilerplate uses letters
    * outside the hex alphabet so it can never collide with
    * random-region content. */
  def mixedEvasion(spark: SparkSession, nShort: Long, nLong: Long): DataFrame = {
    val boiler = "zqzjvxw" // 7 chars, no hex digits
    require(boiler.length == 7)
    spark.range(nShort + nLong).select(col("id").as("doc_id"), expr(
      s"""CASE
          WHEN id < $nLong THEN
            concat(substring(concat(md5(cast(id AS STRING)),
              md5(concat('s:', id)), md5(concat('t:', id))), 1, 65),
              substring(md5(concat('u:', id)), 1, 8), '$boiler')
          WHEN pmod(id - $nLong, 50) = 49 THEN
            concat(overlay(overlay(substring(concat(md5(cast(id - 1 AS STRING)),
              md5(concat('s:', id - 1)), md5(concat('t:', id - 1))), 1, 65)
              PLACING 'Z' FROM 8 FOR 1) PLACING 'Z' FROM 32 FOR 1), '$boiler')
          ELSE
            concat(substring(concat(md5(cast(id AS STRING)),
              md5(concat('s:', id)), md5(concat('t:', id))), 1, 65), '$boiler')
          END""").as("text"))
  }

  def main(args: Array[String]): Unit = {
    val nShort = args.headOption.map(_.toLong).getOrElse(500000L)
    val nLong = args.lift(1).map(_.toLong).getOrElse(150L)
    require(nShort % 50 == 0, "nShort must be a multiple of 50 for the closed form")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local("graft-evasion-stress", cpus)
    spark.sparkContext.setLogLevel("WARN")
    val docs = mixedEvasion(spark, nShort, nLong)
    val expect = nShort / 50

    def run(label: String, detectOn: Boolean): (Long, Double) = {
      spark.conf.set("spark.graft.editdistSegsGiant", detectOn.toString)
      val st = graft.dedup.EditDistance.stages(docs, "doc_id", "text",
        maxFrac = 0.1, headChars = 80, extraSegs = 2)
      // time the ONE action the operator pays (stage counts would each
      // re-run shared sub-plans and conflate the A-B)
      val t0 = System.nanoTime()
      val got = st("result").count()
      val s = (System.nanoTime() - t0) / 1e9
      // detector views, counted AFTER the timing on warm caches
      val hot = st("hotKeys").count()
      val g1 = st("giantKeys").count()
      val g2 = st("giantKeys2").count()
      println(f"[evasion] $label%-12s nShort=$nShort nLong=$nLong hotKeys=$hot " +
        f"giantHot=$g1 giantSegs=$g2 pairs=$got%8d expect=$expect%8d " +
        f"${if (got == expect) "OK" else "MISMATCH"} $s%8.1f s")
      graft.dedup.Dedup.releaseCaches()
      spark.catalog.clearCache()
      (got, s)
    }

    // interleaved: off (pre-r14 behavior), on, off, on
    val r = Seq("off-1" -> false, "on-1" -> true, "off-2" -> false, "on-2" -> true)
      .map { case (l, d) => (l, d, run(l, d)) }
    val offs = r.filter(!_._2).map(_._3._2)
    val ons = r.filter(_._2).map(_._3._2)
    println(f"[evasion] medians: off=${offs.sorted.apply(offs.size / 2)}%.1f s " +
      f"on=${ons.sorted.apply(ons.size / 2)}%.1f s; counts equal=${r.map(_._3._1).distinct.size == 1}")
    spark.stop()
  }
}
