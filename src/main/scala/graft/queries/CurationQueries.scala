package graft.queries

import graft.Tables
import graft.pipeline.{Dsir, Packing, Sampling}
import graft.text.{Collocations, HeavyHitters}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data curation queries (SURVEY.md §2 #68–72): sequence
  * packing, deterministic sampling, heavy hitters, collocations. */
object CurationQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // #68 concat-and-chunk sequence packing (budget 512 tokens,
    // 8 md5 shards) — window arithmetic, fully oracle-checked.
    "q_pack" -> ((s, dir) =>
      Packing.chunkPack(Tables.documents(s, dir), "doc_id", "text",
          budget = 512, shards = 8)
        .orderBy("doc_id")),

    // #68b best-fit-decreasing no-split packing — oracled: the greedy
    // scan replays as a recursive CTE whose struct ordering encodes
    // the best-fit tie discipline (below); validity/quality also
    // pinned by PackingSpec.
    "q_pack_binpack" -> ((s, dir) =>
      Packing.binPack(Tables.documents(s, dir), "doc_id", "text",
          budget = 512, shards = 8)
        .orderBy("doc_id")),

    // #68c grouped curriculum packing: sequences never cross a
    // language boundary and each (lang, shard) stream is concatenated
    // easy-first (n_chars ascending, id tie-break) — window
    // arithmetic, fully oracle-checked.
    "q_pack_grouped" -> ((s, dir) =>
      Packing.chunkPackByGroup(Tables.documents(s, dir), "doc_id", "text", "lang",
          budget = 512, shards = 4, orderCol = Some("n_chars"))
        .orderBy("doc_id")),

    // #68d per-group best-fit-decreasing packing — oracled like
    // q_pack_binpack; purity/capacity/quality also pinned by
    // CurationOpsSpec.
    "q_pack_binpack_grouped" -> ((s, dir) =>
      Packing.binPackByGroup(Tables.documents(s, dir), "doc_id", "text", "lang",
          budget = 512, shards = 4)
        .orderBy("doc_id")),

    // #69 stratified sample: md5-smallest 20 documents per language.
    "q_sample_stratified" -> ((s, dir) =>
      Sampling.stratified(Tables.documents(s, dir), "lang", "doc_id", n = 20)
        .select("doc_id", "lang", "rn")
        .orderBy("doc_id")),

    // #69b weighted sample without replacement (Efraimidis–Spirakis),
    // P(pick) ∝ n_chars, k = 25.
    "q_sample_weighted" -> ((s, dir) =>
      Sampling.weighted(Tables.documents(s, dir), "doc_id", "n_chars", k = 25)
        .select("doc_id", "n_chars", "es_key")
        .orderBy("doc_id")),

    // #70 exact heavy hitters: top-30 tokens corpus-wide.
    "q_heavy_hitters" -> ((s, dir) =>
      HeavyHitters.exact(Tables.documents(s, dir), "text", k = 30)),

    // #70c the no-vocabulary-shuffle path: SpaceSaving candidates per
    // partition, exact counts for candidates only — same results, same
    // oracle as q_heavy_hitters, but the aggregation shuffles ~m rows
    // per partition instead of the whole vocabulary.
    "q_heavy_hitters_scalable" -> ((s, dir) =>
      HeavyHitters.topKScalable(Tables.documents(s, dir), "text", k = 30)),

    // #70b Count-Min estimates checked against the exact counts.
    // Sketch internals are engine-specific, so the oracle checks the
    // BOUND, not the estimate: the query emits the exact top-30
    // (tok, cnt) — DuckDB recomputes them — plus within =
    // (cnt ≤ cnt_cms ≤ cnt + 4⌈εN⌉), asserted true by the oracle.
    "q_heavy_hitters_cms" -> ((s, dir) =>
      HeavyHitters.withCmsBoundCheck(Tables.documents(s, dir), "text", k = 30)
        .orderBy(col("cnt").desc, col("tok"))),

    // #71 bigram collocations by PMI (count ≥ 10, top 20).
    "q_colloc_pmi" -> ((s, dir) =>
      Collocations.pmiBigrams(Tables.documents(s, dir), "text",
        minCount = 10, k = 20)),

    // #69c deterministic mixture rebalance: 40% of English, all of
    // Chinese, 70% of everything else — per-row expression, no shuffle.
    "q_mixture" -> ((s, dir) =>
      Sampling.mixture(Tables.documents(s, dir), "lang", "doc_id",
          Map("en" -> 40, "zh" -> 100), defaultPct = 70)
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    // #69d token-budget mixture: keep-rates derived from each
    // language's actual character mass against a 400k-char budget
    // (en share 0.4, zh 0.3, default 0.1) — one tiny group aggregate,
    // broadcast join, per-row md5 filter.
    "q_mixture_tokens" -> ((s, dir) =>
      Sampling.mixtureByMass(Tables.documents(s, dir), "lang", "doc_id", "n_chars",
          Map("en" -> 0.4, "zh" -> 0.3), budget = 400000L, defaultShare = 0.1)
        .select("doc_id", "lang", "keep_rate")
        .orderBy("doc_id")),

    // #72 TF-IDF: 3 most characteristic terms per document.
    "q_tfidf" -> ((s, dir) =>
      graft.text.TfIdf.topTerms(Tables.documents(s, dir), "doc_id", "text", k = 3)
        .orderBy("doc_id", "rn")),

    // #75 DSIR importance log-weights: target = every 10th document,
    // raw = the full corpus; hashed unigram+bigram LM ratio per doc.
    "q_dsir" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val target = docs.filter(col("doc_id") % 10 === 0)
      Dsir.importanceLogWeights(docs,
          Dsir.logRatios(target, docs, "text", "doc_id", buckets = 10000),
          "text", "doc_id", buckets = 10000)
        .orderBy("doc_id")
    }),

    // #75b DSIR Gumbel top-k resample (k=100): exact weighted
    // without-replacement selection, fully deterministic (md5 draw).
    "q_dsir_sample" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val target = docs.filter(col("doc_id") % 10 === 0)
      Dsir.sample(docs, target, "text", "doc_id", k = 100, buckets = 10000)
    }),

    // #79 deterministic global training-order shuffle: md5-keyed
    // parallel range-sort, position as dense rank — the epoch-order
    // primitive (engine-portable, no rand()).
    "q_shuffle_order" -> ((s, dir) =>
      Sampling.shuffleOrder(Tables.documents(s, dir), "doc_id", salt = "epoch0")
        .select("doc_id", "pos").orderBy("doc_id")),

    // #80 sliding-window chunking (overflowing tokens, stride 64 of
    // maxLen 128): per-row projection, zero shuffle.
    "q_chunk_windows" -> ((s, dir) =>
      Packing.slidingWindows(Tables.documents(s, dir), "doc_id", "text",
          maxLen = 128, stride = 64)
        .orderBy("doc_id", "win_id")),
  )

  private val md5Long =
    "cast(('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"

  val oracle: Map[String, String] = Map(
    // best-fit-decreasing replayed from first principles: the bin
    // state is a LIST of (rem, seq, bin) structs whose POSITIONAL
    // struct ordering IS the best-fit discipline (min remaining that
    // fits, FIFO by arrival at that remaining = min insertion step) -
    // one recursive-CTE step per item per shard, exactly the Scala
    // packer's (n_tokens desc, id asc) scan. Pure integer logic, so
    // the engines must agree bin-for-bin.
    "q_pack_binpack" ->
      """WITH RECURSIVE w AS (
         |  SELECT doc_id,
         |    cast(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
         |    cast(cast(('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8 AS BIGINT) AS shard
         |  FROM documents),
         |items AS (
         |  SELECT doc_id, shard, n_tokens,
         |    row_number() OVER (PARTITION BY shard ORDER BY n_tokens DESC, doc_id) AS i
         |  FROM w WHERE n_tokens > 0),
         |pack(shard, i, doc_id, n_tokens, bin, oversize, bins, nextbin, step) AS (
         |  SELECT shard, i, doc_id, n_tokens,
         |         cast(0 AS BIGINT), n_tokens > 512,
         |         CASE WHEN n_tokens > 512 OR 512 - n_tokens = 0
         |              THEN list_filter([{'rem': cast(1 AS BIGINT), 'seq': cast(0 AS BIGINT), 'bin': cast(0 AS BIGINT)}], b -> false)
         |              ELSE [{'rem': 512 - n_tokens, 'seq': cast(0 AS BIGINT), 'bin': cast(0 AS BIGINT)}] END,
         |         cast(1 AS BIGINT), cast(1 AS BIGINT)
         |  FROM items WHERE i = 1
         |  UNION ALL
         |  SELECT shard, i, doc_id, n_tokens,
         |         CASE WHEN oversize OR fit IS NULL THEN nextbin ELSE fit.bin END,
         |         oversize,
         |         CASE WHEN oversize THEN bins
         |              WHEN fit IS NULL THEN
         |                bins || CASE WHEN 512 - n_tokens > 0
         |                             THEN [{'rem': 512 - n_tokens, 'seq': step, 'bin': nextbin}]
         |                             ELSE list_filter(bins, b -> false) END
         |              ELSE list_filter(bins, b -> NOT (b.rem = fit.rem AND b.seq = fit.seq))
         |                   || CASE WHEN fit.rem - n_tokens > 0
         |                           THEN [{'rem': fit.rem - n_tokens, 'seq': step, 'bin': fit.bin}]
         |                           ELSE list_filter(bins, b -> false) END
         |         END,
         |         CASE WHEN oversize OR fit IS NULL THEN nextbin + 1 ELSE nextbin END,
         |         step + 1
         |  FROM (
         |    SELECT t.shard, t.i, t.doc_id, t.n_tokens,
         |           t.n_tokens > 512 AS oversize,
         |           p.bins, p.nextbin, p.step + 1 AS step,
         |           list_sort(list_filter(p.bins, b -> b.rem >= t.n_tokens))[1] AS fit
         |    FROM pack p JOIN items t ON t.shard = p.shard AND t.i = p.i + 1
         |  )
         |)
         |SELECT doc_id, shard, n_tokens, bin, oversize FROM pack ORDER BY doc_id""".stripMargin,

    // the grouped variant: identical machinery with (lang, shard)
    // bin sets and 4 shards.
    "q_pack_binpack_grouped" ->
      """WITH RECURSIVE w AS (
         |  SELECT doc_id, cast(lang AS VARCHAR) AS "group",
         |    cast(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
         |    cast(cast(('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 4 AS BIGINT) AS shard
         |  FROM documents),
         |items AS (
         |  SELECT doc_id, "group", shard, n_tokens,
         |    row_number() OVER (PARTITION BY "group", shard ORDER BY n_tokens DESC, doc_id) AS i
         |  FROM w WHERE n_tokens > 0),
         |pack("group", shard, i, doc_id, n_tokens, bin, oversize, bins, nextbin, step) AS (
         |  SELECT "group", shard, i, doc_id, n_tokens,
         |         cast(0 AS BIGINT), n_tokens > 512,
         |         CASE WHEN n_tokens > 512 OR 512 - n_tokens = 0
         |              THEN list_filter([{'rem': cast(1 AS BIGINT), 'seq': cast(0 AS BIGINT), 'bin': cast(0 AS BIGINT)}], b -> false)
         |              ELSE [{'rem': 512 - n_tokens, 'seq': cast(0 AS BIGINT), 'bin': cast(0 AS BIGINT)}] END,
         |         cast(1 AS BIGINT), cast(1 AS BIGINT)
         |  FROM items WHERE i = 1
         |  UNION ALL
         |  SELECT "group", shard, i, doc_id, n_tokens,
         |         CASE WHEN oversize OR fit IS NULL THEN nextbin ELSE fit.bin END,
         |         oversize,
         |         CASE WHEN oversize THEN bins
         |              WHEN fit IS NULL THEN
         |                bins || CASE WHEN 512 - n_tokens > 0
         |                             THEN [{'rem': 512 - n_tokens, 'seq': step, 'bin': nextbin}]
         |                             ELSE list_filter(bins, b -> false) END
         |              ELSE list_filter(bins, b -> NOT (b.rem = fit.rem AND b.seq = fit.seq))
         |                   || CASE WHEN fit.rem - n_tokens > 0
         |                           THEN [{'rem': fit.rem - n_tokens, 'seq': step, 'bin': fit.bin}]
         |                           ELSE list_filter(bins, b -> false) END
         |         END,
         |         CASE WHEN oversize OR fit IS NULL THEN nextbin + 1 ELSE nextbin END,
         |         step + 1
         |  FROM (
         |    SELECT t."group", t.shard, t.i, t.doc_id, t.n_tokens,
         |           t.n_tokens > 512 AS oversize,
         |           p.bins, p.nextbin, p.step + 1 AS step,
         |           list_sort(list_filter(p.bins, b -> b.rem >= t.n_tokens))[1] AS fit
         |    FROM pack p JOIN items t ON t."group" = p."group" AND t.shard = p.shard AND t.i = p.i + 1
         |  )
         |)
         |SELECT doc_id, "group", shard, n_tokens, bin, oversize FROM pack ORDER BY doc_id""".stripMargin,

    "q_pack" ->
      s"""WITH w AS (SELECT doc_id,
         |  cast(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
         |  cast($md5Long % 8 AS BIGINT) AS shard
         | FROM documents),
         |p AS (SELECT doc_id, shard, n_tokens,
         |  cast(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |        ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS tok_start
         | FROM w WHERE n_tokens > 0)
         |SELECT doc_id, shard, n_tokens, tok_start,
         | cast(floor(tok_start / 512.0) AS BIGINT) AS seq_first,
         | cast(floor((tok_start + n_tokens - 1) / 512.0) AS BIGINT) AS seq_last
         |FROM p ORDER BY doc_id""".stripMargin,

    "q_pack_grouped" ->
      s"""WITH w AS (SELECT doc_id, lang, n_chars,
         |  cast(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
         |  cast($md5Long % 4 AS BIGINT) AS shard
         | FROM documents),
         |p AS (SELECT doc_id, lang, shard, n_tokens,
         |  cast(sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY n_chars, doc_id
         |        ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS tok_start
         | FROM w WHERE n_tokens > 0)
         |SELECT doc_id, lang, shard, n_tokens, tok_start,
         | cast(floor(tok_start / 512.0) AS BIGINT) AS seq_first,
         | cast(floor((tok_start + n_tokens - 1) / 512.0) AS BIGINT) AS seq_last
         |FROM p ORDER BY doc_id""".stripMargin,

    "q_sample_stratified" ->
      s"""WITH s AS (SELECT doc_id, lang,
         |  row_number() OVER (PARTITION BY lang ORDER BY $md5Long, doc_id) AS rn
         | FROM documents)
         |SELECT doc_id, lang, cast(rn AS INTEGER) AS rn
         |FROM s WHERE rn <= 20 ORDER BY doc_id""".stripMargin,

    "q_sample_weighted" ->
      s"""WITH s AS (SELECT doc_id, n_chars,
         |  round(ln(($md5Long + 1.0) / 4294967296.0) / n_chars, 6) AS es_key
         | FROM documents WHERE n_chars > 0
         | ORDER BY es_key DESC, doc_id LIMIT 25)
         |SELECT doc_id, n_chars, es_key
         |FROM s ORDER BY doc_id""".stripMargin,

    "q_heavy_hitters" ->
      """WITH t AS (SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS tok
        |           FROM documents)
        |SELECT tok, count(*) AS cnt FROM t
        |GROUP BY tok ORDER BY cnt DESC, tok LIMIT 30""".stripMargin,

    // the scalable path is exact whenever the SpaceSaving superset
    // guarantee holds (k=30 ≪ m=4096) — so it shares the exact oracle
    "q_heavy_hitters_scalable" ->
      """WITH t AS (SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS tok
        |           FROM documents)
        |SELECT tok, count(*) AS cnt FROM t
        |GROUP BY tok ORDER BY cnt DESC, tok LIMIT 30""".stripMargin,

    // bound oracle (the q_quantile_approx pattern): DuckDB recomputes
    // the exact top-30 independently; `within` asserts the Spark-side
    // Count-Min bound check came back true for every token
    "q_heavy_hitters_cms" ->
      """WITH t AS (SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS tok
        |           FROM documents)
        |SELECT tok, count(*) AS cnt, true AS within FROM t
        |GROUP BY tok ORDER BY cnt DESC, tok LIMIT 30""".stripMargin,

    "q_colloc_pmi" ->
      """WITH w AS (SELECT list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS ws
        |           FROM documents),
        |bi AS (SELECT ws[i] AS a, ws[i+1] AS b
        |       FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS i) t
        |       WHERE len(ws) >= 2),
        |bc AS (SELECT a, b, count(*) AS cnt FROM bi GROUP BY a, b),
        |uni AS (SELECT unnest(ws) AS tok FROM w),
        |uc AS (SELECT tok, count(*) AS tf FROM uni GROUP BY tok),
        |tot AS (SELECT (SELECT count(*) FROM uni) AS n_uni,
        |               (SELECT sum(cnt) FROM bc) AS n_bi)
        |SELECT a, b, cnt,
        | round(ln((cast(cnt AS DOUBLE) / n_bi) /
        |   ((cast(ta.tf AS DOUBLE) / n_uni) * (cast(tb.tf AS DOUBLE) / n_uni))), 4) AS pmi
        |FROM bc JOIN uc ta ON bc.a = ta.tok JOIN uc tb ON bc.b = tb.tok, tot
        |WHERE cnt >= 10
        |ORDER BY pmi DESC, a, b LIMIT 20""".stripMargin,

    "q_mixture" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE $md5Long % 100 <
         |  CASE WHEN lang = 'en' THEN 40 WHEN lang = 'zh' THEN 100 ELSE 70 END
         |ORDER BY doc_id""".stripMargin,

    "q_mixture_tokens" ->
      s"""WITH tot AS (SELECT lang, sum(cast(n_chars AS DOUBLE)) AS mass
         | FROM documents GROUP BY lang),
         |r AS (SELECT lang,
         |  round(least(1.0, (CASE lang WHEN 'en' THEN 0.4 WHEN 'zh' THEN 0.3 ELSE 0.1 END)
         |    * 400000 / mass), 6) AS keep_rate
         | FROM tot WHERE mass > 0)
         |SELECT d.doc_id, d.lang, r.keep_rate
         |FROM documents d JOIN r USING (lang)
         |WHERE cast(('0x' || substr(md5('mixmass:' || cast(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |  < cast(floor(keep_rate * 4294967296) AS BIGINT)
         |ORDER BY doc_id""".stripMargin,

    "q_tfidf" ->
      """WITH t AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS term
        |           FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n FROM documents),
        |s AS (SELECT doc_id, term, tf, df,
        |        round(tf * ln(cast(n.n AS DOUBLE) / df), 4) AS tfidf
        |      FROM tf JOIN dfq USING (term), n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
        |      FROM s)
        |SELECT doc_id, term, tf, df, tfidf, cast(rn AS INTEGER) AS rn
        |FROM r WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,

    "q_dsir" ->
      (dsirWeightsSql + "\n" +
        """SELECT doc_id, count(*) AS n_grams, round(sum(log_ratio), 4) AS log_w
          |FROM b JOIN ratio USING (bucket) GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    "q_dsir_sample" ->
      (dsirWeightsSql + ",\n" +
        """wgt AS (SELECT doc_id, count(*) AS n_grams, sum(log_ratio) AS lw
          |        FROM b JOIN ratio USING (bucket) GROUP BY doc_id)
          |SELECT doc_id, n_grams, round(lw, 4) AS log_w,
          |  round(lw - ln(-ln((cast(('0x' || substr(md5('dsir:' || cast(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1.0) / 4294967296.0)), 4) AS g
          |FROM wgt ORDER BY g DESC, doc_id LIMIT 100""".stripMargin),

    "q_shuffle_order" ->
      """SELECT doc_id,
        | cast(row_number() OVER (ORDER BY
        |   cast(('0x' || substr(md5('epoch0:' || cast(doc_id AS VARCHAR)), 1, 8)) AS BIGINT),
        |   doc_id) - 1 AS BIGINT) AS pos
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_chunk_windows" ->
      """WITH mk AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS ws FROM documents),
        |w AS (SELECT doc_id, i AS start, ws[i+1:i+128] AS wt
        |      FROM mk, LATERAL (SELECT unnest(generate_series(0, len(ws)-1, 64)) AS i) t
        |      WHERE len(ws) >= 1 AND (i = 0 OR i - 64 + 128 < len(ws)))
        |SELECT doc_id, cast(start/64 AS BIGINT) AS win_id, cast(start AS BIGINT) AS start,
        | cast(len(wt) AS BIGINT) AS win_tokens, array_to_string(wt, ' ') AS win_text
        |FROM w ORDER BY doc_id, win_id""".stripMargin,
  )

  /** Shared DSIR oracle prelude: grams → buckets → smoothed per-bucket
    * log ratios (target = doc_id % 10 = 0, buckets = 10000), matching
    * `Dsir.logRatios` exactly. Callers append their final CTE (after
    * ",") or SELECT. */
  private lazy val dsirWeightsSql =
    """WITH mk AS (SELECT doc_id,
      |  list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS ws FROM documents),
      |g AS (
      |  SELECT doc_id, unnest(ws) AS gram FROM mk
      |  UNION ALL
      |  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS gram
      |  FROM mk, LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS i) t
      |  WHERE len(ws) >= 2),
      |b AS (SELECT doc_id, cast(('0x' || substr(md5(gram), 1, 8)) AS BIGINT) % 10000 AS bucket FROM g),
      |tc AS (SELECT bucket, count(*) AS ct FROM b WHERE doc_id % 10 = 0 GROUP BY bucket),
      |rc AS (SELECT bucket, count(*) AS cr FROM b GROUP BY bucket),
      |tt AS (SELECT sum(ct) AS t FROM tc),
      |rt AS (SELECT sum(cr) AS r FROM rc),
      |ratio AS (SELECT sp.bucket,
      |    ln((coalesce(ct, 0) + 1.0) / (t + 10000)) - ln((coalesce(cr, 0) + 1.0) / (r + 10000)) AS log_ratio
      |  FROM (SELECT range AS bucket FROM range(0, 10000)) sp
      |  LEFT JOIN tc USING (bucket) LEFT JOIN rc USING (bucket), tt, rt)""".stripMargin
}
