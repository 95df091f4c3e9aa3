package graft

import graft.operators._
import graft.operators.FrameOps._
import graft.dedup.Dedup
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate inputs: empty frames, single rows, all-null columns —
  * operators must return empty/neutral results, not throw. */
class EdgeCaseSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val emptyDocs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  test("empty frames: stats, histogram, quantiles, dedup, fingerprints") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("x", DoubleType))))
    val s = Stats.statistics(empty, "x").first()
    assert(s.getAs[Long]("cnt") == 0 && s.isNullAt(1))
    assert(Histogram.histogram(empty, "x", 1.0).count() == 0)
    // percentile of nothing → null array → explodes to zero rows
    assert(Stats.quantiles(empty, "x", Seq(0.5)).count() == 0)
    assert(Dedup.exact(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.ngramJaccardPairs(emptyDocs, "doc_id", "text").count() == 0)
    assert(TextAnalysis.fingerprints(emptyDocs, "text", "doc_id").count() == 0)
  }

  test("single-row series: fits return nulls not crashes, meanmax returns the value") {
    val one = Seq((1.0, 2.0)).toDF("x", "y")
    val lin = Fit.linear(one, "x", "y").first()
    assert(lin.isNullAt(1)) // slope undefined on 1 point
    val mm = MeanMax.meanMax(Seq((1L, 0L, 5.0)).toDF("k", "eps", "v"), "k", "eps", "v", Seq(10L))
    assert(mm.first().getAs[Double]("best_avg") == 5.0)
  }

  test("all-null column: countNa totals, describe, validOnly") {
    val df = Seq((1, Option.empty[Double]), (2, Option.empty[Double])).toDF("id", "v")
    assert(df.countNa("v").first().getLong(0) == 2)
    assert(df.validOnly("v").count() == 0)
    val d = df.describeNumeric(Seq("v")).first()
    assert(d.getAs[Long]("cnt") == 0)
  }

  test("short documents: shingles/minhash skip docs below k words") {
    val docs = Seq((1L, "one two"), (2L, "a b c d e")).toDF("doc_id", "text")
    assert(Dedup.shingles(docs, "doc_id", "text", 3).select("doc_id").distinct().count() == 1)
    assert(Dedup.minhashCandidates(docs, "doc_id", "text").count() == 0)
    val und = spark.range(1).select(TextAnalysis.languageId(lit("")).as("g")).first()
    assert(und.getString(0) == "und") // empty text → "und"
  }

  test("spline with fewer than 3 knots degrades to linear/constant") {
    val knots = Seq((1L, 0.0, 1.0), (1L, 10.0, 3.0)).toDF("k", "x", "y")
    val probes = Seq((1L, 5.0)).toDF("k", "px")
    val r = Spline.interpolate(knots, probes, "k", "x", "y", "px").first()
    assert(r.getDouble(2) == 2.0) // straight line between two knots
  }
}
