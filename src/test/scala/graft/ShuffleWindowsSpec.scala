package graft

import graft.pipeline.{Packing, Sampling}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the deterministic training-order shuffle and the
  * sliding-window chunker — both fully deterministic, so every
  * property is checked against a driver-side brute force. */
class ShuffleWindowsSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("shuffleOrder assigns a 0..n-1 permutation, stable across runs") {
    val df = (0L until 500L).map(i => (i, s"doc $i")).toDF("id", "text")
    def run() = Sampling.shuffleOrder(df, "id", "s1")
      .select("id", "pos").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val got = run()
    assert(got.map(_._2).sorted == (0L until 500L))
    assert(got == run())
  }

  test("shuffleOrder matches a driver-side sort of the same md5 keys") {
    val df = (0L until 300L).map(i => (i, i.toString)).toDF("id", "text")
    val got = Sampling.shuffleOrder(df, "id", "e0")
      .select("id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val keyed = df.select(col("id"),
        graft.pipeline.Curation.md5Long(concat(lit("e0:"), col("id").cast("string"))).as("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = keyed.sortBy { case (id, k) => (k, id) }.zipWithIndex
      .map { case ((id, _), pos) => id -> pos.toLong }.toMap
    assert(got == want)
  }

  test("different salts give different permutations (epochs decorrelate)") {
    val df = (0L until 200L).map(i => (i, i.toString)).toDF("id", "text")
    def order(salt: String) = Sampling.shuffleOrder(df, "id", salt)
      .orderBy("pos").select("id").collect().map(_.getLong(0)).toSeq
    assert(order("epoch0") != order("epoch1"))
  }

  test("slidingWindows covers every token; windows match brute force") {
    val docs = Seq(
      (1L, (1 to 300).map(i => s"t$i").mkString(" ")), // long: many windows
      (2L, (1 to 128).map(i => s"u$i").mkString(" ")), // exactly maxLen
      (3L, "a b c"),                                   // shorter than maxLen
      (4L, ""),                                        // empty: no windows
      (5L, (1 to 129).map(i => s"v$i").mkString(" "))  // one token past maxLen
    ).toDF("doc_id", "text")
    val got = Packing.slidingWindows(docs, "doc_id", "text", maxLen = 128, stride = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    def brute(id: Long, toks: Array[String]): Seq[(Long, Long, Long, Long, String)] = {
      val starts = Iterator.from(0, 64).takeWhile(s =>
        s < toks.length && (s == 0 || s - 64 + 128 < toks.length)).toSeq
      starts.map { s =>
        val wt = toks.slice(s, s + 128)
        (id, (s / 64).toLong, s.toLong, wt.length.toLong, wt.mkString(" "))
      }
    }
    val want = Seq(
      1L -> (1 to 300).map(i => s"t$i").toArray,
      2L -> (1 to 128).map(i => s"u$i").toArray,
      3L -> Array("a", "b", "c"),
      5L -> (1 to 129).map(i => s"v$i").toArray
    ).flatMap { case (id, toks) => brute(id, toks) }
    assert(got.sortBy(t => (t._1, t._2)).toSeq == want.sortBy(t => (t._1, t._2)))
    // coverage: every token index of every doc falls in ≥1 window
    want.groupBy(_._1).foreach { case (id, ws) =>
      val n = Map(1L -> 300, 2L -> 128, 3L -> 3, 5L -> 129)(id)
      val covered = ws.flatMap(w => w._3 until (w._3 + w._4)).toSet
      assert(covered == (0L until n).toSet, s"doc $id coverage gap")
    }
  }

  test("stride == maxLen partitions the token stream exactly") {
    val df = Seq((7L, (1 to 250).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val ws = Packing.slidingWindows(df, "doc_id", "text", maxLen = 100, stride = 100)
      .orderBy("win_id").collect()
    assert(ws.map(_.getLong(3)).toSeq == Seq(100L, 100L, 50L))
    assert(ws.map(_.getString(4)).mkString(" ") == (1 to 250).map(i => s"w$i").mkString(" "))
  }
}
