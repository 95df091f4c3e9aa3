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
  * Salt is a content hash of the large side's row (all columns), so
  * the same row always lands in the same salt bucket: task retries and
  * recomputations reproduce identical partition contents, unlike a
  * positional monotonically_increasing_id salt which reshuffles
  * whenever Spark re-splits the input. Identical rows co-locate (same
  * bucket), which is harmless — the skew being treated lives on the
  * join KEY, whose rows differ in their payload columns.
  */
object SkewJoin {

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 factor: Int = 8, joinType: String = "inner"): DataFrame = {
    // right/full outer would emit null-padded rows for replicated
    // small-side copies whose salt found no partner — semantically wrong
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti", "cross").contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left-side join types, got $joinType")
    val payload = large.columns.map(col).toIndexedSeq
    val salted = large.withColumn("__salt",
      pmod(xxhash64(payload: _*), lit(factor)).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
