package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the persistent co-location strategy for repeated
  * equi-joins (GraftIndex.bucketed): both sides pre-hashed into the
  * same bucket count on the join key, so the join plan has NO shuffle
  * exchange — at 100 TB this is the difference between re-shuffling
  * the fact table per query and reading co-located buckets. */
class BucketedJoinSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val left = (1 to 10000).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
    val right = (1 to 10000).map(i => (i.toLong, s"n$i")).toDF("k", "name")
    left.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bj_left")
    right.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bj_right")
    val joined = spark.table("bj_left").join(spark.table("bj_right"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    withClue(plan) {
      assert(!plan.contains("Exchange hashpartitioning"))
    }
    assert(joined.count() == 10000)
    spark.sql("DROP TABLE bj_left"); spark.sql("DROP TABLE bj_right")
  }
}
