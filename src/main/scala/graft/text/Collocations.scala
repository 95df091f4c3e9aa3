package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram collocation mining by pointwise mutual information —
  * PMI(a,b) = ln( p(a,b) / (p(a)·p(b)) ) with p(a,b) over consecutive
  * word pairs and p(·) over all tokens (Church & Hanks 1990).
  *
  * Shape at scale: one bigram hash aggregation, one unigram hash
  * aggregation (both map-side partial), two equi-joins keyed on the
  * token (the bigram-count frame joins the unigram counts for each
  * side — vocabulary-keyed shuffles, AQE free to broadcast a small
  * vocabulary), then a global top-k via TakeOrderedAndProject. The
  * two corpus totals are single aggregate scalars. Nothing is
  * quadratic and no driver state grows with the corpus.
  */
object Collocations {

  /** Top-k bigrams by PMI among those with count ≥ minCount. Output
    * (a, b, cnt, pmi) ordered by (pmi desc, a, b); pmi rounded to 4
    * decimals BEFORE ordering so the ordering itself is
    * engine-portable. */
  def pmiBigrams(df: DataFrame, textCol: String, minCount: Int, k: Int): DataFrame = {
    val withWs = graft.Parallelism.spread(df)
      .select(TextAnalysis.words(col(textCol)).as("ws"))
    val bi = withWs.filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(ws)-1), " +
          "i -> struct(element_at(ws, i) as a, element_at(ws, i+1) as b))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val biCnt = bi.groupBy("a", "b").agg(count(lit(1)).as("cnt"))
    val uni = withWs.select(explode(col("ws")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("tf"))
    // totals stay IN the plan (broadcast one-row frames, the
    // unigramLogProb pattern): no eager driver action, no recompute of
    // the explode/aggregate pipeline when the result executes. An
    // empty/1-word corpus yields an empty biCnt, so the joins (and the
    // result) are empty without a special case.
    val totals = graft.operators.ScalarAttach.attach(
      biCnt.agg(sum("cnt").as("n_bi")), uni.agg(sum("tf").as("n_uni")))
    graft.operators.ScalarAttach.attach(
      biCnt.filter(col("cnt") >= minCount)
        .join(uni.withColumnRenamed("tok", "a").withColumnRenamed("tf", "tf_a"), Seq("a"))
        .join(uni.withColumnRenamed("tok", "b").withColumnRenamed("tf", "tf_b"), Seq("b")),
      totals)
      .select(col("a"), col("b"), col("cnt"),
        round(log((col("cnt").cast("double") / col("n_bi")) /
          ((col("tf_a").cast("double") / col("n_uni")) *
            (col("tf_b").cast("double") / col("n_uni")))), 4)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("a"), col("b"))
      .limit(k)
  }
}
