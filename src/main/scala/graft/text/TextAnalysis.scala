package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for large-scale corpus pipelines (SURVEY.md §2
  * #47–50): tokenization, quality scoring, language ID, winnowing
  * fingerprints. All pure column expressions (whole-stage codegen) —
  * no UDFs, no shuffles except the caller's aggregations.
  */
object TextAnalysis {

  /** Whitespace words, empty-safe. */
  def words(text: Column): Column =
    filter(split(text, "\\s+"), w => w =!= "")

  /** BPE-ish token stream: letter runs, single digits, single
    * punctuation marks. */
  def bpeTokens(text: Column): Column =
    // lowercase first — the letter-run branch is [a-z]+, so capitals
    // would otherwise tokenize as single punctuation marks
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]|[^a-z0-9\\s]"), lit(0))

  /** Total characters across words. */
  def wordChars(ws: Column): Column =
    aggregate(ws, lit(0), (acc, w) => acc + length(w))

  /** Unigram + bigram gram stream over a words-array column (the
    * fasttext/DSIR feature space; bigrams joined with a single space).
    * The bigram branch is size-guarded: Spark's `sequence(1, 0)`
    * counts DOWN to [1, 0] and element_at(ws, 0) throws, so one-word
    * docs must take the empty-array branch, not an empty sequence. */
  def wordGrams(wsCol: String): Column =
    concat(col(wsCol),
      when(size(col(wsCol)) >= 2, expr(
        s"transform(sequence(1, size($wsCol) - 1), " +
          s"i -> concat(element_at($wsCol, i), ' ', element_at($wsCol, i + 1)))"))
        .otherwise(array().cast("array<string>")))

  def stopwordCount(ws: Column, stopwords: Seq[String]): Column = {
    val arr = array(stopwords.map(lit): _*)
    size(filter(ws, w => array_contains(arr, w)))
  }

  /** Quality features + a deterministic composite score in [0,1]. */
  def quality(df: DataFrame, textCol: String, idCol: String,
              stopwords: Seq[String]): DataFrame = {
    df.withColumn("__ws", words(col(textCol)))
      .withColumn("n_words", size(col("__ws")))
      // empty docs: defined zeros, not null-from-division (or
      // DIVIDE_BY_ZERO under ANSI mode)
      .withColumn("__sr", when(col("n_words") === 0, 0.0)
        .otherwise(stopwordCount(col("__ws"), stopwords).cast("double") / col("n_words")))
      .withColumn("mean_word_len", when(col("n_words") === 0, 0.0)
        .otherwise(round(wordChars(col("__ws")).cast("double") / col("n_words"), 4)))
      .withColumn("stop_ratio", round(col("__sr"), 4))
      // score from UNROUNDED ratio — rounding first would park values on
      // exact half-decimal boundaries and make cross-engine rounding flap
      .withColumn("quality_score",
        round(least(col("n_words") / 100.0, lit(1.0)) * 0.5 + col("__sr") * 0.5, 4))
      .select(col(idCol), col("n_words"), col("mean_word_len"),
        col("stop_ratio"), col("quality_score"))
  }

  /** Unigram language-model score per document — the CCNet-style
    * quality signal: each token's log-probability under the corpus' own
    * unigram distribution (every corpus token has tf ≥ 1, so no
    * smoothing term is needed), averaged per document. Low scores mark
    * gibberish/outlier documents. Shape: one vocabulary aggregation,
    * one token-keyed equi-join, one broadcast scalar — all shuffles are
    * keyed, nothing driver-side. Returns (idCol, n_tokens,
    * avg_logprob); token-less documents produce no row. */
  def unigramLogProb(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = graft.Parallelism.spread(df)
      .select(col(idCol), explode(words(col(textCol))).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("tf"))
    val n = toks.agg(count(lit(1)).as("total"))
    graft.operators.ScalarAttach.attach(toks.join(vocab, Seq("tok")), n)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(log(col("tf").cast("double") / col("total"))), 4).as("avg_logprob"))
  }

  /** Bigram-LM fluency score: per-document average of
    * ln P(wᵢ | wᵢ₋₁) under the corpus' own bigram model,
    * P(b | a) = c(a,b) / c(a·) with c(a·) counting occurrences of `a`
    * in a LEFT-context position (so the conditional sums to 1 and
    * every observed bigram has a defined, smoothing-free probability).
    * The bigram analogue of [[unigramLogProb]] — the standard
    * fluency/perplexity quality filter shape: word-salad documents
    * score far below fluent ones even when their unigram mix is
    * normal. Shape: one bigram aggregation, one left-context
    * aggregation, two vocabulary-keyed equi-joins, one per-doc
    * aggregation — all keyed shuffles. Documents with < 2 words
    * produce no row. */
  def bigramLogProb(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val bi = graft.Parallelism.spread(df)
      .withColumn("__ws", words(col(textCol)))
      .filter(size(col("__ws")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(1, size(__ws) - 1), " +
          "i -> struct(element_at(__ws, i) as a, element_at(__ws, i + 1) as b))")).as("p"))
      .select(col(idCol), col("p.a").as("a"), col("p.b").as("b"))
    val biCnt = bi.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
    val leftCnt = bi.groupBy("a").agg(count(lit(1)).as("c_a"))
    bi.join(biCnt, Seq("a", "b")).join(leftCnt, Seq("a"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log(col("c_ab").cast("double") / col("c_a"))), 4).as("avg_logprob"))
  }

  /** Trigram LM with stupid backoff (Brants et al. '07), trained on
    * one split and scored on another — the held-out-perplexity quality
    * filter shape: unlike [[bigramLogProb]] (self-scored, every event
    * observed), a held-out document hits unseen trigrams, so the
    * backoff chain is exercised for real. Score per trigram (a,b,c):
    *   S = c₃(abc)/c₂(ab)            if the trigram was seen in train,
    *   S = α·c₂(bc)/c₁(b)            else if the (b,c) bigram was,
    *   S = α²·(c₁(c)+1)/(N+V)        else (add-one unigram floor, so
    *                                  OOV words stay finite).
    * with α = 0.4, c₂ counting TRIGRAM-SLOT prefixes (so the seen-case
    * conditional sums to 1) and bigram-slot counts for the backoff
    * tier. Returns per scored doc: (idCol, n_trigrams, avg_logscore,
    * backoff_frac — the share of positions that backed off).
    *
    * Shape: train-side n-gram aggregations (map-side partial), then
    * three LEFT equi-joins keyed on the n-grams, one per-doc agg — all
    * keyed shuffles; the model lives in the plan, never on the driver.
    * Scored docs with < 3 words produce no row. */
  def trigramBackoffScore(train: DataFrame, score: DataFrame,
                          textCol: String, idCol: String,
                          alpha: Double = 0.4): DataFrame = {
    def tris(d: DataFrame) = graft.Parallelism.spread(d)
      .withColumn("__ws", words(col(textCol)))
      .filter(size(col("__ws")) >= 3)
      .select(col(idCol), explode(expr(
        "transform(sequence(1, size(__ws) - 2), " +
          "i -> struct(element_at(__ws, i) as a, element_at(__ws, i + 1) as b, " +
          "element_at(__ws, i + 2) as c))")).as("p"))
      .select(col(idCol), col("p.a").as("a"), col("p.b").as("b"), col("p.c").as("c"))
    val trTri = tris(train)
    val c3 = trTri.groupBy("a", "b", "c").agg(count(lit(1)).as("c_abc"))
    val c2ab = trTri.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
    val trBi = graft.Parallelism.spread(train)
      .withColumn("__ws", words(col(textCol)))
      .filter(size(col("__ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(__ws) - 1), " +
          "i -> struct(element_at(__ws, i) as b, element_at(__ws, i + 1) as c))")).as("p"))
      .select(col("p.b").as("b"), col("p.c").as("c"))
    val c2bc = trBi.groupBy("b", "c").agg(count(lit(1)).as("c_bc"))
    val c1b = trBi.groupBy("b").agg(count(lit(1)).as("c_b"))
    val trTok = graft.Parallelism.spread(train)
      .select(explode(words(col(textCol))).as("c"))
    val c1 = trTok.groupBy("c").agg(count(lit(1)).as("c_c"))
    val nv = trTok.agg(count(lit(1)).as("n_total"),
      countDistinct(col("c")).as("v_types"))

    graft.operators.ScalarAttach.attach(
      tris(score)
        .join(c3, Seq("a", "b", "c"), "left")
        .join(c2ab, Seq("a", "b"), "left")
        .join(c2bc, Seq("b", "c"), "left")
        .join(c1b, Seq("b"), "left")
        .join(c1, Seq("c"), "left"), nv)
      .withColumn("__s",
        when(col("c_abc").isNotNull,
          col("c_abc").cast("double") / col("c_ab"))
        .when(col("c_bc").isNotNull,
          lit(alpha) * col("c_bc").cast("double") / col("c_b"))
        .otherwise(lit(alpha * alpha) *
          (coalesce(col("c_c"), lit(0L)).cast("double") + 1.0) /
          (col("n_total") + col("v_types")).cast("double")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"),
        round(avg(log(col("__s"))), 4).as("avg_logscore"),
        round(avg(when(col("c_abc").isNull, 1.0).otherwise(0.0)), 4).as("backoff_frac"))
  }

  /** Repetition signals (the public MassiveText/Gopher-style quality
    * heuristics: excessive within-document repetition marks boilerplate
    * and spam): per document, the duplicate fraction of its 2-grams and
    * 3-grams (1 − distinct/total) and the share of bigram slots taken
    * by its single most frequent bigram. Shape: one n-gram explode +
    * (doc, gram) hash aggregation per order, then a per-doc aggregation
    * — map-side-partial all the way, no windows; the top-bigram share
    * only needs max(count), no argmax. Documents with < 3 words
    * produce no row.
    *
    * Memory shape: the in-row fold holds ONE document's sorted gram
    * array in its task (~3× the doc's text bytes for trigram concats)
    * — fine for web-scale docs (KBs–MBs), but a pathological 100 MB+
    * document concentrates O(doc) strings in one task where the old
    * shuffle formulation spread them. `maxTokens > 0` bounds that:
    * signals are computed over each doc's first `maxTokens` tokens (a
    * DOCUMENTED approximation — repetition ratios over a long prefix
    * track the full-doc ratios for the boilerplate/spam this operator
    * screens; the registered oracle query runs uncapped). */
  def repetitionSignals(df: DataFrame, textCol: String, idCol: String,
                        maxTokens: Int = 0): DataFrame = {
    // ZERO-shuffle formulation: every signal is a function of ONE
    // document's own grams, so nothing belongs in a corpus-wide
    // groupBy — the earlier version shuffled every gram string twice
    // (the (doc, gram) count and the per-doc rollup) for what an
    // in-row fold computes on the scan. Per row: sort the gram array,
    // then one codegen'd `aggregate` pass counts distinct runs and the
    // longest run. The operator becomes a pure projection — legal in a
    // streaming gate and free at 100 TB (it rides the scan), the
    // spanStatsPerRow pattern.
    def gramFold(k: Int) = expr(
      s"""aggregate(
            array_sort(transform(sequence(1, size(__ws) - ${k - 1}),
              i -> concat_ws(' ', slice(__ws, i, $k)))),
            struct(cast(null as string) as prev, 0L as d, 0L as cur, 0L as mx),
            (a, x) -> struct(
              x as prev,
              a.d + if(a.prev is null or x != a.prev, 1L, 0L) as d,
              if(x = a.prev, a.cur + 1L, 1L) as cur,
              greatest(a.mx, if(x = a.prev, a.cur + 1L, 1L)) as mx),
            a -> struct(a.d as d, a.mx as mx))""")
    val wsCol = if (maxTokens > 0) slice(words(col(textCol)), 1, maxTokens)
                else words(col(textCol))
    graft.Parallelism.spread(df)
      .withColumn("__ws", wsCol)
      .filter(size(col("__ws")) >= 3)
      .withColumn("__g2", gramFold(2))
      .withColumn("__g3", gramFold(3))
      .select(col(idCol),
        (size(col("__ws")) - 1).cast("long").as("n_bigrams"),
        round(lit(1.0) - col("__g2.d").cast("double") /
          (size(col("__ws")) - 1).cast("long"), 4).as("dup_bigram_frac"),
        round(col("__g2.mx").cast("double") /
          (size(col("__ws")) - 1).cast("long"), 4).as("top_bigram_frac"),
        (size(col("__ws")) - 2).cast("long").as("n_trigrams"),
        round(lit(1.0) - col("__g3.d").cast("double") /
          (size(col("__ws")) - 2).cast("long"), 4).as("dup_trigram_frac"))
  }

  /** Corpus vocabulary statistics: token and type counts plus
    * type-token ratio. `approx=true` swaps the exact distinct (a
    * shuffle of the full vocabulary) for HyperLogLog
    * approx_count_distinct — the single-pass mergeable sketch to use at
    * 100 TB, where an exact type count is rarely worth its shuffle. */
  def vocabStats(df: DataFrame, textCol: String, approx: Boolean = false): DataFrame = {
    val toks = df.select(explode(words(col(textCol))).as("tok"))
    val types =
      if (approx) approx_count_distinct(col("tok")).as("n_types")
      else countDistinct(col("tok")).as("n_types")
    toks.agg(count(lit(1)).as("n_tokens"), types)
      .select(col("n_tokens"), col("n_types"),
        round(col("n_types").cast("double") / col("n_tokens"), 4).as("type_token_ratio"))
  }

  /** Tiny per-language marker lexicons for the n-gram/stopword
    * language-ID heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "los", "las", "una", "es", "que", "por", "como"),
    "fr" -> Seq("le", "les", "des", "une", "est", "et", "dans", "pour"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  /** Language ID: argmax of marker-hit counts, deterministic tie-break
    * on language code ("und" when nothing matches). Latin-script
    * languages match whitespace tokens; zh matches marker CHARACTERS
    * anywhere in the raw text (unsegmented Chinese has no whitespace
    * word boundaries, so token matching could never fire). */
  def languageId(textCol: Column): Column = {
    val ws = words(textCol)
    // (-hits, lang) sorted ascending: most hits first, alphabetical
    // tie-break — fully deterministic.
    val scored = langMarkers.map { case (lang, markers) =>
      val hits =
        if (lang == "zh")
          markers.map(m => when(textCol.contains(m), 1).otherwise(0)).reduce(_ + _)
        else stopwordCount(ws, markers)
      struct((-hits).as("neg"), lit(lang).as("lang"))
    }
    val best = sort_array(array(scored: _*)).getItem(0)
    when(best.getField("neg") < 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Winnowing fingerprints (Schleimer et al., SIGMOD'03): k-word
    * shingles hashed with the engine-portable 60-bit md5 prefix
    * ([[graft.pipeline.Curation.md5Long60]] — fingerprints are
    * compared across corpora and across engines, so the hash is part
    * of the operator's contract, not an implementation detail),
    * sliding-window (w) minima, distinct. Returns (idCol, fp bigint)
    * rows.
    *
    * PRECONDITION: `idCol` is unique per input row. The per-doc
    * distinct is an in-row `array_distinct`, so duplicate doc_id ROWS
    * emit duplicate (id, fp) pairs where a corpus-level distinct would
    * collapse them — by design: re-adding a corpus-wide
    * `dropDuplicates` would reintroduce exactly the shuffle this
    * zero-shuffle formulation removed, to defend against an input
    * shape (duplicated primary keys) the rest of the pipeline already
    * rejects. Callers with non-unique ids dedup upstream.
    * `maxTokens > 0` bounds per-task memory on pathological multi-MB
    * docs by fingerprinting only each doc's first `maxTokens` tokens
    * (documented approximation; registered oracle query runs
    * uncapped).
    *
    * Shape notes: shingles come from whole-array shifts (`slice` once
    * per offset, O(k·n) total, not O(k) per element), and the sliding
    * minimum runs in the codegen'd window exec over exploded hashes —
    * per-element `slice` lambdas were ~20× slower interpreted. */
  def fingerprints(df: DataFrame, textCol: String, idCol: String,
                   k: Int = 3, w: Int = 4, maxTokens: Int = 0): DataFrame = {
    // ZERO-shuffle winnowing: the window minima and the per-doc
    // distinct are both functions of one document's own shingle
    // hashes, so they run in the row (sliding `array_min` over each
    // full window + `array_distinct`) instead of a corpus-wide
    // Window-partitionBy + distinct — two exchanges of every shingle
    // hash replaced by a projection that rides the scan
    // (BENCH_fingerprint_ab_r11.json). Winnowing takes minima of FULL
    // windows only (partial tail windows would unconditionally
    // fingerprint every doc's last shingles); short docs keep
    // position 0, whose slice clips to the whole doc.
    val wsCol = if (maxTokens > 0) slice(words(col(textCol)), 1, maxTokens)
                else words(col(textCol))
    val d = graft.Parallelism.spread(df).withColumn("__ws", wsCol)
      .filter(size(col("__ws")) >= k)
    // k shifted copies zipped → one shingle string per position
    val zipped = (0 until k).map(i => expr(s"slice(__ws, ${i + 1}, size(__ws) - ${k - 1})"))
    val shingles = zipped.reduceLeft((acc, nxt) => zip_with(acc, nxt, (a, b) => concat_ws(" ", a, b)))
    val shingleHashes = transform(shingles, s => graft.pipeline.Curation.md5Long60(s))
    d.withColumn("__h", shingleHashes)
      .select(col(idCol), explode(array_distinct(expr(
        s"transform(sequence(0, greatest(size(__h) - $w, 0)), " +
          s"i -> array_min(slice(__h, i + 1, $w)))"))).as("fp"))
  }
}
