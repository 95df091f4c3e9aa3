package graft

import graft.pipeline.Dsir
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance resampling (SURVEY.md §2 #75). The oracle queries
  * pin the arithmetic against DuckDB; these specs pin the semantics on
  * a planted two-domain corpus: documents from the target domain's
  * vocabulary must out-weigh off-domain documents, and the resample
  * must select (almost) only them. */
class DsirSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  // two disjoint vocabularies; deterministic "documents" by cycling
  private def doc(vocab: Seq[String], seed: Int, len: Int): String =
    (0 until len).map(i => vocab((seed * 7 + i * 3) % vocab.size)).mkString(" ")

  private val vocabA = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
  private val vocabB = Seq("one", "two", "three", "four", "five", "six")

  private lazy val target =
    (0 until 30).map(i => (1000L + i, doc(vocabA, i, 40))).toDF("doc_id", "text")
  // raw corpus: 25 in-domain docs (ids 0-24) + 25 off-domain (ids 25-49)
  private lazy val raw =
    ((0 until 25).map(i => (i.toLong, doc(vocabA, i + 3, 40))) ++
      (25 until 50).map(i => (i.toLong, doc(vocabB, i, 40)))).toDF("doc_id", "text")

  test("in-domain documents out-weigh off-domain documents") {
    val ratios = Dsir.logRatios(target, raw, "text", "doc_id", buckets = 1000)
    val w = Dsir.importanceLogWeights(raw, ratios, "text", "doc_id", buckets = 1000)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("log_w")).toMap
    assert(w.size == 50)
    val inDomain = (0L until 25L).map(w)
    val offDomain = (25L until 50L).map(w)
    // every in-domain doc scores above every off-domain doc — the
    // vocabularies are disjoint, so the ratio gap is structural
    assert(inDomain.min > offDomain.max,
      s"in-domain min ${inDomain.min} <= off-domain max ${offDomain.max}")
  }

  test("ratio table is dense and defined for unseen buckets") {
    val ratios = Dsir.logRatios(target, raw, "text", "doc_id", buckets = 1000)
    assert(ratios.count() == 1000)
    assert(ratios.filter(col("log_ratio").isNull).count() == 0)
  }

  test("Gumbel top-k resample selects the in-domain half") {
    val top = Dsir.sample(raw, target, "text", "doc_id", k = 20, buckets = 1000)
      .select("doc_id").as[Long].collect().toSet
    assert(top.size == 20)
    // weights differ by orders of magnitude, so even with Gumbel noise
    // at most a stray doc or two crosses over
    assert(top.count(_ < 25) >= 18, s"only ${top.count(_ < 25)} in-domain of 20")
  }

  test("resample is deterministic across runs") {
    def run() = Dsir.sample(raw, target, "text", "doc_id", k = 10, buckets = 1000)
      .select("doc_id").as[Long].collect().toSeq
    assert(run() == run())
  }

  test("one-word and empty documents don't break the gram stream") {
    val tiny = Seq((1L, "alpha"), (2L, ""), (3L, "alpha beta")).toDF("doc_id", "text")
    val ratios = Dsir.logRatios(tiny, tiny, "text", "doc_id", buckets = 100)
    val w = Dsir.importanceLogWeights(tiny, ratios, "text", "doc_id", buckets = 100)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_grams")).toMap
    // doc 1: one unigram; doc 2: no row; doc 3: two unigrams + one bigram
    assert(w == Map(1L -> 1L, 3L -> 3L))
  }
}
