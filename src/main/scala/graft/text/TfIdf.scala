package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term ranking: the k most characteristic terms per document,
  * tfidf = tf · ln(N / df) (raw counts, no smoothing — df ≥ 1 always
  * holds for observed terms).
  *
  * Shape at scale: one (doc, term) hash aggregation, one term-keyed
  * aggregation for document frequencies, one term-keyed equi-join to
  * put idf next to tf (vocabulary-sized sides — AQE broadcasts when
  * small), then a per-document rank. The rank filter compiles to
  * WindowGroupLimit, so each map task keeps only its local top-k per
  * document before the exchange. The doc count N stays IN the plan
  * as a broadcast one-row frame (the Collocations totals pattern):
  * no eager driver job at call time, the scan it needs prunes to
  * zero columns, and the operator composes lazily like everything
  * else.
  *
  * Ordering is engine-portable: tfidf is rounded to 4 decimals BEFORE
  * ranking and ties break on the term, so the top-k cut is identical
  * in any engine (a raw-double rank could flip on last-ulp ln
  * differences). */
object TfIdf {

  /** Top-k terms per document: (idCol, term, tf, df, tfidf, rn). */
  def topTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val toks = graft.Parallelism.spread(df)
      .select(col(idCol), explode(TextAnalysis.words(col(textCol))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // N counts ALL documents (a token-less doc still shrinks every
    // term's idf), so it aggregates df itself — a zero-column scan,
    // not the tokenized pipeline — and rides along as one broadcast row
    val totals = df.agg(count(lit(1)).as("n_docs"))
    val scored = graft.operators.ScalarAttach.attach(tf.join(dfreq, Seq("term")), totals)
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
    val w = Window.partitionBy(idCol).orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("tfidf"), col("rn"))
  }
}
