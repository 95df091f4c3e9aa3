package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev main: editdist robustness beyond the bench corpus (VERDICT r10
  * item 5). The sf10 knob grid proved cost invariance on ONE corpus
  * shape; this generates two synthetic corpora at the same document
  * count whose TRUE pair counts are known in closed form, so the
  * operator's output is cross-checked exactly while its cost profile
  * is probed at the two extremes the bench corpus sits between.
  *
  *  - HIGH-ENTROPY: every head is 80 chars of doc-unique md5 hex (no
  *    shared boilerplate at all — the hot-segment machinery should
  *    never fire); every 50th document is a planted copy of its
  *    predecessor with exactly 2 substitutions ('Z' is not a hex
  *    char, so each overlay is a real edit). True pairs = n/50; a
  *    chance pair needs two independent random hex strings within
  *    edit distance 8 (LCS >= 76 of 80 where E[LCS] ~ 34) —
  *    probability astronomically small.
  *  - ADVERSARIAL (all-near-identical): every head shares a FIXED
  *    aperiodic 40-char boilerplate prefix (half the head is
  *    corpus-hot — strictly more hot segments than the default spare
  *    can drop), followed by 40 chars of cluster-unique md5 hex;
  *    members m = 0..9 of each 10-doc cluster carry m % 4
  *    substitutions at member-disjoint positions inside the cluster
  *    region, so intra-cluster distances are <= 6 <= budget 8 and ALL
  *    C(10,2) = 45 intra pairs qualify. True pairs = clusters x 45;
  *    cross-cluster pairs need two random 40-char hex tails within
  *    distance 14 — again astronomically unlikely.
  *
  * Before running the operator on the adversarial corpus, the main
  * PREDICTS the candidate-join volume for a given extraSegs (sum over
  * join keys of segsDf x probeDf — two aggregations, no join), so a
  * configuration that would blow up is reported instead of filling
  * the disk (the round-10 lesson, applied preemptively).
  *
  *   tools/runjvm.sh graft.EditDistStress [n] [extraSegsAdv]
  */
object EditDistStress {

  /** n docs: doc-unique random hex heads; id % 50 == 49 copies id-1
    * with 2 substitutions. True pairs: n/50. */
  def highEntropy(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id").as("doc_id"), expr(
      """CASE WHEN id % 50 = 49
         THEN overlay(overlay(substring(concat(md5(cast(id - 1 AS STRING)),
                md5(concat('s:', id - 1)), md5(concat('t:', id - 1))), 1, 80)
                PLACING 'Z' FROM 8 FOR 1) PLACING 'Z' FROM 32 FOR 1)
         ELSE substring(concat(md5(cast(id AS STRING)),
                md5(concat('s:', id)), md5(concat('t:', id))), 1, 80)
         END""").as("text"))

  /** n docs in clusters of 10: fixed 40-char boilerplate + 40 cluster
    * hex chars; member m carries m % 4 'Z' substitutions at positions
    * 41 + 4m .. 41 + 4m + (m % 4) - 1 (member-disjoint). True pairs:
    * (n / 10) * 45. */
  def adversarial(spark: SparkSession, n: Long): DataFrame = {
    val boiler = "the quick brown fox jumps over lazy dogs" // 40 chars, aperiodic
    require(boiler.length == 40)
    spark.range(n)
      .withColumn("__h", expr(
        s"""concat('$boiler', substring(concat(md5(concat('c:', id div 10)),
            md5(concat('d:', id div 10))), 1, 40))"""))
      .withColumn("__bp", expr("cast(41 + 4 * pmod(id, 10) AS INT)"))
      .select(col("id").as("doc_id"), expr(
        """CASE cast(pmod(id, 10) % 4 AS INT)
           WHEN 0 THEN __h
           WHEN 1 THEN overlay(__h PLACING 'Z' FROM __bp FOR 1)
           WHEN 2 THEN overlay(overlay(__h PLACING 'Z' FROM __bp FOR 1)
                         PLACING 'Z' FROM __bp + 1 FOR 1)
           ELSE overlay(overlay(overlay(__h PLACING 'Z' FROM __bp FOR 1)
                         PLACING 'Z' FROM __bp + 1 FOR 1)
                         PLACING 'Z' FROM __bp + 2 FOR 1)
           END""").as("text"))
  }

  /** The round-12 backstop corpus: a 60-char shared boilerplate
    * prefix spans MORE segments than even rung 11's spare can drop
    * (at extraSegs=11: c=20 width-4 segments, boilerplate hot in ~15,
    * spare=11 → ~4 corpus-hot keys survive suppression), so the
    * candidate join carries ~4·n² rows on keys hot on BOTH sides —
    * the single-giant-key shape the giant-key block split exists for.
    * 20-char cluster-unique hex tails; member m of each 10-doc
    * cluster carries m % 2 substitutions at member-disjoint
    * positions, so all 45 intra-cluster pairs are within budget.
    * Cross-cluster tails sit at edit distance ~17 (measured min 12
    * over 20k samples) vs budget 8 — intra pairs dominate; the run
    * reports the intra floor and the block-on/off COUNT EQUALITY
    * (the real invariant) rather than a closed-form total. */
  def adversarial60(spark: SparkSession, n: Long): DataFrame = {
    val boiler = "sphinx of black quartz judge my vow while zebras fly kites aa".take(60)
    require(boiler.length == 60)
    spark.range(n)
      .withColumn("__h", expr(
        s"""concat('$boiler', substring(concat(md5(concat('c:', id div 10)),
            md5(concat('d:', id div 10))), 1, 20))"""))
      .withColumn("__bp", expr("cast(61 + pmod(id, 10) * 2 AS INT)"))
      .select(col("id").as("doc_id"), expr(
        """CASE cast(pmod(id, 10) % 2 AS INT)
           WHEN 0 THEN __h
           ELSE overlay(__h PLACING 'Z' FROM __bp FOR 1)
           END""").as("text"))
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    val extraSegsAdv = args.lift(1).map(_.toInt).getOrElse(9)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local("graft-editdist-stress", cpus)
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String, docs: DataFrame, expect: Long, extraSegs: Int): Unit = {
      val t0 = System.nanoTime()
      val got = graft.dedup.EditDistance.editDistancePairs(
        docs, "doc_id", "text", maxFrac = 0.1, headChars = 80,
        extraSegs = extraSegs).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[stress] $name%-14s n=$n extraSegs=$extraSegs pairs=$got%10d expect=$expect%10d ${if (got == expect) "OK" else "MISMATCH"} $s%8.1f s")
      graft.dedup.Dedup.releaseCaches()
      spark.catalog.clearCache()
    }

    /** Predicted candidate-join volume for the adversarial corpus at
      * `extraSegs`: sum over keys of segsDf * probeDf via the
      * operator's own stage frames — no join executed. */
    def predict(docs: DataFrame, extraSegs: Int): Long = {
      val st = graft.dedup.EditDistance.stages(docs, "doc_id", "text",
        maxFrac = 0.1, headChars = 80, extraSegs = extraSegs)
      val a = st("segsIndexed").groupBy("__k").agg(count(lit(1)).as("a"))
      val b = st("probe").groupBy("__k").agg(count(lit(1)).as("b"))
      // null guard: an empty key join sums to NULL — report volume 0
      // instead of aborting the stress run with an NPE
      val row = a.join(b, Seq("__k")).agg(sum(col("a") * col("b"))).first()
      val v = if (row.isNullAt(0)) 0L else row.getLong(0)
      graft.dedup.Dedup.releaseCaches()
      spark.catalog.clearCache()
      v
    }

    /** The shipped auto chooser's rung decision for this corpus —
      * the predictor above, productized (editDistancePairsAuto). */
    def choose(name: String, docs: DataFrame): Int = {
      val rung = graft.dedup.EditDistance.chooseExtraSegs(docs, "doc_id", "text",
        maxFrac = 0.1, headChars = 80, hotDf = 64, skewSampleFrac = 0.1,
        hotFrac = 0.05, hotDfCap = 256, candPerDoc = 50000,
        ladder = Seq(2, 5, 8, 11))
      graft.dedup.Dedup.releaseCaches()
      spark.catalog.clearCache()
      println(s"[stress] auto chooser on $name: extraSegs=$rung")
      rung
    }

    val he = highEntropy(spark, n)
    choose("high_entropy", he)
    run("high_entropy", he, n / 50, extraSegs = 2)

    val adv = adversarial(spark, n)
    choose("adversarial", adv)
    for (es <- Seq(2, extraSegsAdv)) {
      val v = predict(adv, es)
      println(f"[stress] adversarial candidate volume at extraSegs=$es: $v%,d")
      if (v <= 20000000000L) run("adversarial", adv, n / 10 * 45, es)
      else println(s"[stress] adversarial SKIPPED at extraSegs=$es: predicted " +
        f"$v%,d candidates (${v / 100000000L} x 1e8) would repeat the round-10 disk fill")
    }

    // 60-char boilerplate: beyond EVERY rung's suppression reach —
    // the giant-key block split is what keeps the irreducible ~4·n²
    // candidate stream parallel instead of 4 straggler tasks. Block
    // on/off must agree exactly on the pair count.
    val n60 = args.lift(2).map(_.toLong).getOrElse(math.min(n, 30000L))
    val adv60 = adversarial60(spark, n60)
    val rung60 = choose("adversarial60", adv60)
    val v60 = predict(adv60, rung60)
    println(f"[stress] adversarial60 candidate volume at extraSegs=$rung60: $v60%,d")
    def run60(label: String, blockTarget: Long): Long = {
      val t0 = System.nanoTime()
      val got = graft.dedup.EditDistance.editDistancePairs(
        adv60, "doc_id", "text", maxFrac = 0.1, headChars = 80,
        extraSegs = rung60, blockTarget = blockTarget).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[stress] adversarial60 $label%-10s n=$n60 pairs=$got%10d (intra floor=${n60 / 10 * 45}) $s%8.1f s")
      graft.dedup.Dedup.releaseCaches()
      spark.catalog.clearCache()
      got
    }
    if (v60 <= 60000000000L) {
      val on = run60("block-on", 2000000L)
      val off = run60("block-off", Long.MaxValue)
      println(s"[stress] adversarial60 block on/off counts ${if (on == off) "MATCH" else s"MISMATCH $on vs $off"}")
    } else println(f"[stress] adversarial60 SKIPPED: predicted $v60%,d candidates")
    spark.stop()
  }
}
