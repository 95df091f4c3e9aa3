package graft

import graft.text.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Trigram stupid-backoff LM (SURVEY.md §2 #80) pinned by hand on a
  * corpus where each backoff tier fires exactly once. */
class TrigramBackoffSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("each backoff tier scores as hand-computed") {
    // train: "a b c a b d"  →  trigram slots: (a,b,c), (b,c,a), (c,a,b), (a,b,d)
    //   c3: abc=1, bca=1, cab=1, abd=1 ; c2ab (trigram prefixes): ab=2, bc=1, ca=1
    //   bigram slots: ab, bc, ca, ab, bd → c2bc: ab=2, bc=1, ca=1, bd=1 ; c1b: a=2, b=2, c=1
    //   tokens: a,b,c,a,b,d → N=6, V=4, c1: a=2, b=2, c=1, d=1
    val train = Seq((1L, "a b c a b d")).toDF("doc_id", "text")
    // score: "a b c x" → trigrams:
    //   (a,b,c): seen   → 1/2
    //   (b,c,x): unseen, bigram (c,x) unseen, x OOV → 0.16·(0+1)/(6+4)
    val score = Seq((2L, "a b c x")).toDF("doc_id", "text")
    val out = TextAnalysis.trigramBackoffScore(train, score, "text", "doc_id")
      .as[(Long, Long, Double, Double)].collect()
    assert(out.length === 1)
    val (id, n, avg, bo) = out.head
    assert(id === 2L && n === 2L)
    val expected = (math.log(0.5) + math.log(0.4 * 0.4 * 1.0 / 10.0)) / 2.0
    assert(math.abs(avg - expected) < 1e-4)
    assert(bo === 0.5)
  }

  test("bigram tier: seen (b,c) bigram, unseen trigram") {
    // train: "p q r s q r" → trigram slots: (p,q,r),(q,r,s),(r,s,q),(s,q,r)
    // score: "s q r" has trigram (s,q,r): SEEN (c3=1, c2ab sq=1) → 1/1.
    // score "p q r s x p q": trigrams (p,q,r) seen 1/1; (q,r,s) seen 1/1;
    //   (r,s,x): unseen, (s,x) unseen, x OOV → 0.16·1/(6+4)... N=6 V=4
    //   (s,x,p): unseen, (x,p) unseen, p seen c1=1 → 0.16·(1+1)/10
    //   (x,p,q): unseen, bigram (p,q) SEEN c_bc=1, c_b p=1 → 0.4·1/1
    val train = Seq((1L, "p q r s q r")).toDF("doc_id", "text")
    val score = Seq((2L, "p q r s x p q")).toDF("doc_id", "text")
    val out = TextAnalysis.trigramBackoffScore(train, score, "text", "doc_id")
      .as[(Long, Long, Double, Double)].collect()
    val (_, n, avg, bo) = out.head
    assert(n === 5L)
    val terms = Seq(1.0, 1.0, 0.4 * 0.4 * 1 / 10.0, 0.4 * 0.4 * 2 / 10.0, 0.4 * 1.0)
    val expected = terms.map(math.log).sum / 5.0
    assert(math.abs(avg - expected) < 1e-4)
    assert(bo === 0.6)
  }

  test("held-out scoring at sf0.001 is deterministic and backoff-active") {
    val docs = Tables.documents(spark, sf)
    val out = TextAnalysis.trigramBackoffScore(
      docs.filter(col("doc_id") % 5 < 4), docs.filter(col("doc_id") % 5 === 4),
      "text", "doc_id")
    val a = out.orderBy("doc_id").collect()
    val b = out.orderBy("doc_id").collect()
    assert(a.sameElements(b))
    assert(a.nonEmpty)
  }
}
