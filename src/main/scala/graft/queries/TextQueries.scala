package graft.queries

import graft.Tables
import graft.text.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis queries (SURVEY.md §2 #47–50) over `documents`. */
object TextQueries {

  type Q = (SparkSession, String) => DataFrame

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  val queries: Map[String, Q] = Map(
    // #49 token counting: whitespace + BPE-ish regex.
    "q_text_tokens" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          size(TextAnalysis.words(col("text"))).as("ws_tokens"),
          size(TextAnalysis.bpeTokens(col("text"))).as("bpe_tokens"))
        .orderBy("doc_id")),

    // #48 quality scoring.
    "q_text_quality" -> ((s, dir) =>
      TextAnalysis.quality(Tables.documents(s, dir), "text", "doc_id", stopwords)
        .orderBy("doc_id")),

    // #47 language ID (rows-only: heuristic, no SQL equivalent).
    "q_text_langid" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), TextAnalysis.languageId(col("text")).as("lang_guess"))
        .orderBy("doc_id")),

    // #50 winnowing fingerprints (rows-only: engine-hash specific).
    "q_text_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprints(Tables.documents(s, dir), "text", "doc_id")
        .orderBy("doc_id", "fp")),

    // #48b unigram-LM quality signal (CCNet-style): per-doc average
    // token log-probability under the corpus' own unigram distribution.
    "q_text_lm" -> ((s, dir) =>
      TextAnalysis.unigramLogProb(Tables.documents(s, dir), "text", "doc_id")
        .orderBy("doc_id")),
  )

  val oracle: Map[String, String] = Map(
    "q_text_tokens" ->
      """SELECT doc_id,
        | cast(len(list_filter(regexp_split_to_array(text, '\s+'), w -> w <> '')) as int) AS ws_tokens,
        | cast(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]')) as int) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_quality" ->
      """WITH w AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS ws FROM documents),
        |f AS (SELECT doc_id, len(ws) AS n_words,
        |  CASE WHEN len(ws) = 0 THEN 0.0 ELSE cast(list_sum(list_transform(ws, x -> len(x))) as double) / len(ws) END AS mwl,
        |  CASE WHEN len(ws) = 0 THEN 0.0 ELSE cast(len(list_filter(ws, x -> x IN ('the','a','of','and','to','in','is','it'))) as double) / len(ws) END AS sr
        | FROM w)
        |SELECT doc_id, cast(n_words as int) AS n_words, round(mwl, 4) AS mean_word_len,
        | round(sr, 4) AS stop_ratio,
        | round(least(n_words/100.0, 1.0)*0.5 + sr*0.5, 4) AS quality_score
        |FROM f ORDER BY doc_id""".stripMargin,

    "q_text_lm" ->
      """WITH w AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS ws FROM documents),
        |t AS (SELECT doc_id, unnest(ws) AS tok FROM w),
        |v AS (SELECT tok, count(*) AS tf FROM t GROUP BY tok),
        |n AS (SELECT count(*) AS total FROM t)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(avg(ln(cast(tf AS double) / total)), 4) AS avg_logprob
        |FROM t JOIN v USING (tok), n
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
  )
}
