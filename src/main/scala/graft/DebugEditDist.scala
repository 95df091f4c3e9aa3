package graft

import org.apache.spark.sql.functions._

/** One-off stage profiler for [[graft.dedup.EditDistance]]: times the
  * candidate routes and verify separately so optimization effort goes
  * where the seconds are (inlines the operator's frames — keep in sync
  * by hand; this is a scratch tool, not a library surface). Mirrors
  * the DebugNgram/DebugSkew pattern. */
object DebugEditDist {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local("graft-debug-editdist", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    import graft.dedup.Dedup

    val maxFrac = 0.1; val headChars = 80; val hotDf = sys.env.getOrElse("DBG_HOTDF", "64").toInt; val p = 0.1
    val extraSegs = 2
    val keep = 1 - maxFrac
    def olenMax(lp: String) = s"least($headChars, cast(ceil(($lp) / ${keep}D) as int))"
    def dOf(lp: String) = s"cast(floor(${olenMax(lp)} * ${maxFrac}D) as int)"
    def cOf(lp: String) =
      s"greatest(least(${dOf(lp)} + 1 + $extraSegs, $lp), ${dOf(lp)} + 1)"
    def wBase(lp: String, c: String) = s"(($lp) div ($c))"
    def segW(lp: String, c: String, i: String) =
      s"(${wBase(lp, c)} + if(($i) > ($c) - (($lp) % ($c)), 1, 0))"
    def segP(lp: String, c: String, i: String) =
      s"((($i) - 1) * ${wBase(lp, c)} + greatest(0, ($i) - 1 - (($c) - (($lp) % ($c)))) + 1)"

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
      r
    }

    val docs = Tables.documents(spark, sfDir)
    t("docs.count")(docs.count())

    val heads = Dedup.cachedCorpus(graft.Parallelism.spread(docs)
      .select(col("doc_id").as("id"),
        substring(col("text"), 1, headChars).as("__h"))
      .withColumn("__len", length(col("__h"))))
    t("heads materialize")(heads.count())
    val nonEmpty = heads.filter(col("__len") >= 1)

    val segs = nonEmpty.select(col("id"), col("__len").as("__lp"),
      explode(expr(
        s"""transform(sequence(1, ${cOf("__len")}),
            i -> struct(i as __i,
                        substring(__h, ${segP("__len", cOf("__len"), "i")},
                                       ${segW("__len", cOf("__len"), "i")}) as __s))"""))
        .as("__seg"))
      .select(col("id"), col("__lp"), col("__seg.__i").as("__i"), col("__seg.__s").as("__s"))
    t("segs.count")(segs.count())

    def probeOf(h: org.apache.spark.sql.DataFrame) = h
      .select(col("id"), col("__h"), explode(expr(
        s"""flatten(transform(
              transform(
                transform(
                  transform(
                    sequence(__len - cast(floor(__len * ${maxFrac}D) as int), __len),
                    lp -> struct(lp as lp, ${dOf("lp")} as d)),
                  t -> struct(t.lp as lp, t.d as d,
                              greatest(least(t.d + 1 + $extraSegs, t.lp), t.d + 1) as c)),
                u -> struct(u.lp as lp,
                            u.c as c,
                            (u.lp div u.c) as wb,
                            (u.c - (u.lp % u.c)) as ck,
                            cast(ceil(((__len - u.lp) - u.d) / 2.0D) as int) as slo,
                            ((__len - u.lp) + u.d) div 2 as shi)),
              r -> filter(
                flatten(transform(sequence(1, r.c),
                  i -> transform(sequence(r.slo, r.shi),
                    s -> struct(r.lp as __lp, i as __i,
                                ((i - 1) * r.wb + greatest(0, i - 1 - r.ck) + 1 + s) as __p,
                                (r.wb + if(i > r.ck, 1, 0)) as __w)))),
                x -> x.__p >= 1 and x.__p + x.__w - 1 <= __len)))"""))
        .as("__e"))
      .select(col("id"), col("__e.__lp").as("__lp"), col("__e.__i").as("__i"),
        expr("substring(__h, __e.__p, __e.__w)").as("__s"))
    val probe = probeOf(nonEmpty)
    t("probe.count")(probe.count())

    val probeSample = probeOf(nonEmpty.sample(withReplacement = false, p, seed = 42L))
    val hotKeys = broadcast(probeSample
      .groupBy("__lp", "__i", "__s").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > hotDf * p).select("__lp", "__i", "__s"))
    t("hotKeys.count")(hotKeys.count())

    val hotIds = Dedup.cachedCorpus(
      segs.join(hotKeys, Seq("__lp", "__i", "__s"), "left_semi")
        .groupBy("id", "__lp").agg(count(lit(1)).as("__hot"))
        .filter(col("__hot") > expr(s"${cOf("__lp")} - (${dOf("__lp")} + 1)"))
        .select("id"))
    t("hotIds materialize")(hotIds.count())

    val fullCand = segs.join(hotIds, Seq("id"), "left_anti")
      .join(hotKeys, Seq("__lp", "__i", "__s"), "left_anti")
      .join(probe.withColumnRenamed("id", "id2"), Seq("__lp", "__i", "__s"))
      .filter(col("id") =!= col("id2"))
      .select(least(col("id"), col("id2")).as("doc1"),
        greatest(col("id"), col("id2")).as("doc2"))
    t("fullCand raw rows")(fullCand.count())

    val salts = math.max(1, math.min(32,
      spark.sparkContext.defaultParallelism / 8))
    val banded = nonEmpty.join(hotIds, Seq("id"), "left_semi")
      .select(col("id"), col("__len"))
      .unionByName(heads.filter(col("__len") === 0).select(col("id"), col("__len")))
    t("banded hot heads")(banded.count())
    val bandCand = banded
      .select(col("id").as("sid"), explode(expr(
        s"sequence(__len - cast(floor(__len * $maxFrac) as int), ${olenMax("__len")})"))
        .as("__plen"))
      .withColumn("__salt", explode(expr(s"sequence(0, ${salts - 1})")))
      .join(heads.select(col("id").as("oid"), col("__len").as("__plen"),
          pmod(xxhash64(col("id")), lit(salts)).cast("int").as("__salt")),
        Seq("__plen", "__salt"))
      .filter(col("sid") =!= col("oid"))
      .select(least(col("sid"), col("oid")).as("doc1"),
        greatest(col("sid"), col("oid")).as("doc2"))
    t("bandCand raw rows")(bandCand.count())

    val dMax = math.floor(headChars * maxFrac).toInt
    val hA = heads.select(col("id").as("doc1"), col("__h").as("__hA"), col("__len").as("__lA"))
    val hB = heads.select(col("id").as("doc2"), col("__h").as("__hB"), col("__len").as("__lB"))
    val verified = fullCand.unionByName(bandCand)
      .join(hA, Seq("doc1")).join(hB, Seq("doc2"))
      .withColumn("dist", levenshtein(col("__hA"), col("__hB"), dMax).cast("long"))
      .filter(col("dist") >= 0 &&
        col("dist") <= floor(greatest(col("__lA"), col("__lB")) * maxFrac))
      .select(col("doc1"), col("doc2"), col("dist"))
      .distinct()
    t("verified distinct pairs")(verified.count())

    t("end-to-end editDistancePairs")(
      graft.dedup.EditDistance.editDistancePairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
