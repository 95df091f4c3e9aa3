package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-aware equi-join via key salting.
  *
  * AQE's skew-join splitting handles most skew at runtime; salting is
  * the explicit plan-level tool for the pathological case (one key =
  * 30% of 100 TB): the skewed (large) side gets a random salt in
  * [0, factor), the small side is replicated `factor` times, and the
  * join key becomes (key, salt) — the hot key's rows spread over
  * `factor` tasks instead of one straggler.
  *
  * Salt is a content hash of the large side's row, so the same row
  * always lands in the same salt bucket: task retries and
  * recomputations reproduce identical partition contents, unlike a
  * positional monotonically_increasing_id salt which reshuffles
  * whenever Spark re-splits the input.
  *
  * Two content-hash caveats (pass `saltCol` to defuse both): (1) fully
  * IDENTICAL duplicate rows share one salt, so a hot key consisting of
  * repeated identical rows is NOT split — name a unique id column and
  * the salt is its hash instead; (2) xxhash64 rejects unhashable
  * column types (e.g. map) at analysis — again, hash the named id
  * column only. Without duplicates/maps the default (all columns) is
  * fine: the skew being treated lives on the join KEY, whose rows
  * differ in their payload columns.
  */
object SkewJoin {

  /** Deterministic salt for a `large`-side row: hash of `saltCol` when
    * named (unique ids split identical-payload duplicates and dodge
    * unhashable column types), else hash of every column. */
  private def saltExpr(large: DataFrame, saltCol: Option[String], factor: Int): Column = {
    val basis = saltCol match {
      case Some(c) =>
        require(large.columns.contains(c), s"saltCol $c not in large side")
        IndexedSeq(col(c))
      case None => large.columns.map(col).toIndexedSeq
    }
    pmod(xxhash64(basis: _*), lit(factor)).cast("int")
  }

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 factor: Int = 8, joinType: String = "inner",
                 saltCol: Option[String] = None): DataFrame = {
    // right/full outer would emit null-padded rows for replicated
    // small-side copies whose salt found no partner — semantically wrong
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti", "cross").contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left-side join types, got $joinType")
    val salted = large.withColumn("__salt", saltExpr(large, saltCol, factor))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** [[saltedJoin]] restricted to the keys that are actually hot —
    * the shape that survives scale. Full salting replicates the ENTIRE
    * small side ×factor, which at a 100×-bigger dimension table both
    * multiplies the replicated volume and pushes the join past the
    * broadcast threshold (measured at sf10: full-salt 19.5 s vs 2.0 s
    * plain — the salt cost ate the broadcast). Here a seeded sample
    * finds keys above `hotShare` of the stream; ONLY their rows take
    * the salted two-sided path (the replicated hot slice of the small
    * side is a handful of rows), everything else joins plain —
    * broadcast preserved, stragglers split, identical output. With no
    * hot key detected this IS the plain join. Detection cost: one
    * aggregate over a `sampleFraction` sample. */
  def saltedJoinAuto(large: DataFrame, small: DataFrame, key: String,
                     factor: Int = 8, hotShare: Double = 0.05,
                     sampleFraction: Double = 0.01,
                     joinType: String = "inner",
                     saltCol: Option[String] = None): DataFrame = {
    // same restriction as saltedJoin: replicated small-side copies
    // whose salt finds no partner would null-pad right/full outers
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti", "cross").contains(joinType.toLowerCase),
      s"saltedJoinAuto supports inner/left-side join types, got $joinType")
    require(hotShare > 0 && hotShare <= 1, s"hotShare out of range: $hotShare")
    // persist the aggregated sample (|distinct sampled keys| rows —
    // far smaller than the input) so the total and the hot-key filter
    // don't each rescan the large side's key column
    val sampled = large.select(col(key)).sample(sampleFraction, 42L)
      .groupBy(key).agg(count(lit(1)).as("__c"))
      .persist()
    val hotKeys = try {
      val rows = sampled.agg(sum("__c")).first()
      val total = if (rows.isNullAt(0)) 0L else rows.getLong(0)
      // a key must exceed hotShare of sampled rows → at most 1/hotShare
      // hot keys exist; the collect is bounded and driver-tiny
      if (total == 0) Array.empty[Any]
      else sampled.filter(col("__c") > lit(hotShare * total))
        .select(key).collect().map(_.get(0))
    } finally sampled.unpersist()
    if (hotKeys.isEmpty) large.join(small, Seq(key), joinType)
    else {
      // conditional salt, SINGLE join: hot rows get a real salt and
      // the small side replicates only its hot keys ×factor (cold rows
      // join on salt 0 with the one unreplicated copy). One scan of
      // the large side, and the small side grows by just
      // |hot keys|·factor rows — the broadcast survives.
      val isHot = col(key).isin(hotKeys.toIndexedSeq: _*)
      val salted = large.withColumn("__salt",
        when(isHot, saltExpr(large, saltCol, factor)).otherwise(lit(0)))
      val replicated = small.withColumn("__salt",
        explode(when(isHot, sequence(lit(0), lit(factor - 1)))
          .otherwise(array(lit(0)))))
      salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
    }
  }
}
