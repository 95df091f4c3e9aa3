package graft.queries

import graft.Tables
import graft.multimodal.Multimodal
import graft.operators.{GraftIndex, Simplify, SkewJoin, Spline, Stats}
import graft.streaming.EventStreams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spline, RDP, weighted quantile, sessionization, bucketed-join, and
  * skew-join queries (SURVEY.md §2 #18, #32, #33, #52, #57, #14). */
object MiscQueries {

  type Q = (SparkSession, String) => DataFrame

  /** 90 %-one-key projection of lineitem: every partkey not ≡0 (mod 10)
    * collapses onto hot key 1 — the pathological join-key distribution
    * the salted join exists for. */
  private def skewedLineitem(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select(
      when(pmod(col("l_partkey"), lit(10)) =!= 0, lit(1L)).otherwise(col("l_partkey")).as("k"),
      col("l_quantity"))

  private def partDim(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir).select(col("p_partkey").as("k"), col("p_type"))

  private def skewAgg(joined: DataFrame): DataFrame =
    joined.groupBy("p_type")
      .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("p_type")

  /** Bucket layouts already materialized this session, keyed by
    * (session UUID, source dir): the whole point of a bucketed layout
    * is write-once/join-many, so repeated calls (bench iterations, a
    * long-lived session) reuse the table instead of re-running the
    * CTAS. The physical table name is dir-qualified — two dirs used
    * from one session get two distinct tables, so a memo hit can never
    * serve another dir's rows — and the session keys by reference
    * (held strongly; sessions are few and long-lived), not an identity
    * hash a GC'd session could free for reuse. Returns the resolved
    * table name. */
  private val bucketedReady =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), String]

  private def ensureBucketed(s: SparkSession, dir: String, df: => DataFrame,
      table: String, column: String, buckets: Int): String =
    bucketedReady.getOrElseUpdate((s, dir, table), {
      // 48-bit md5 prefix: 32-bit String.hashCode collides easily
      // enough ("Aa"/"BB") that one dir's CTAS could clobber another's
      // still-memoized table
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
      val name = s"${table}_$digest"
      GraftIndex.bucketed(df, name, column, buckets)
      name
    })

  val queries: Map[String, Q] = Map(
    // #14 bucketed co-located join (GraftIndex.bucketed): both sides
    // pre-hashed into the same bucket count on the join key, so the
    // merge join reads co-located buckets with NO exchange on either
    // side (plan-audited) — at 100 TB the write cost amortizes over
    // every subsequent join/lookup on the key. The hint pins the merge
    // join so the demonstration doesn't silently degrade to broadcast
    // at toy scale.
    "q_lookup_join_bucketed" -> ((s, dir) => {
      val ordersT = ensureBucketed(s, dir,
        Tables.orders(s, dir).select("o_custkey", "o_totalprice"),
        "g_orders_bucketed", "o_custkey", 8)
      val customerT = ensureBucketed(s, dir,
        Tables.customer(s, dir).select("c_custkey", "c_mktsegment"),
        "g_customer_bucketed", "c_custkey", 8)
      s.table(ordersT).hint("merge")
        .join(s.table(customerT), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("c_mktsegment")
    }),

    // #57 skew-salted join demo pair: identical semantics, identical
    // oracle — the plain join piles the hot key onto one shuffle task,
    // the salted join spreads it over `factor` tasks (AQE's runtime
    // skew splitting handles most of this automatically; salting is
    // the explicit plan-level tool, and the pair benches both).
    "q_skew_join_plain" -> ((s, dir) =>
      skewAgg(skewedLineitem(s, dir).join(partDim(s, dir), "k"))),

    // hot-key-only salting: the 90%-key's rows spread over 8 salt
    // buckets while the cold long tail keeps its broadcast join —
    // full-side salting measured 10× slower than plain at sf10 (the
    // ×8-replicated dim lost the broadcast); this shape stays at
    // plain-join cost with the straggler split.
    "q_skew_join_salted" -> ((s, dir) =>
      skewAgg(SkewJoin.saltedJoinAuto(skewedLineitem(s, dir), partDim(s, dir), "k", factor = 8))),

    // #51 multimodal: REAL codec round-trip at table scale — text
    // rows deterministically seed genuine PNG / WAV-PCM / animated-GIF
    // payloads, which then run the real decode paths (ImageIO
    // luminance histograms, javax.sound RMS+ZCR, GIF frame sampling).
    // Rows-only: 3 modality rows with per-modality asset counts,
    // mean first feature, and sampled-frame counts for video.
    "q_multimodal" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 300)
      // two consumers (features, frame sampling) — materialize the
      // per-row codec synthesis once instead of encoding everything twice
      val assets = graft.Checkpoints.checkpoint(Multimodal.assetsFromText(
        graft.Parallelism.spread(docs), "doc_id", "text"))
      val feats = Multimodal.extractFeatures(assets, dim = 8)
      // one-row global frame count, attached to every modality row via
      // the constant-key broadcast hash join and nulled for non-video
      // rows — identical to a left join on a lit("video") key, but that
      // shape's foldable key degenerates to a BNLJ (the join condition
      // collapses to a one-sided literal comparison, leaving no equi
      // key), which the full-registry plan audit bans
      val frameCounts = Multimodal.sampleFrames(assets, everyMs = 50)
        .agg(count(lit(1)).as("__nf"))
      graft.operators.ScalarAttach.attach(
          feats.groupBy("modality")
            .agg(count(lit(1)).as("n_assets"),
              round(avg(element_at(col("features"), 1)), 4).as("mean_f0")),
          frameCounts)
        .withColumn("n_frames", when(col("modality") === "video", col("__nf")))
        .drop("__nf")
        .orderBy("modality")
    }),

    // #18 weighted quantile (integral weights → exact cross-engine
    // threshold comparison).
    "q_weighted_quantile" -> ((s, dir) =>
      Stats.weightedQuantile(Tables.lineitem(s, dir), "l_extendedprice", "l_quantity",
        Seq(0.25, 0.5, 0.75)).orderBy("q")),

    // #32 natural cubic spline through per-user hourly averages,
    // evaluated at half-hour offsets — oracled by a first-principles
    // Thomas-algorithm recursive CTE in DuckDB (below).
    "q_spline" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .withColumn("hour", (col("eps_us") / 3.6e9).cast("double"))
      val knots = e.groupBy(col("user_id"), floor(col("hour")).as("hx"))
        .agg(avg("value").as("hy"))
      // probes are knots+0.5 → fused path: one agg + flatMap, no join
      Spline.interpolateAtOffsets(knots, "user_id", "hx", "hy", 0.5)
        .select(col("user_id"), col("px"), round(col("y"), 4).as("y"))
        .orderBy("user_id", "px")
    }),

    // #33 RDP polyline simplification per user — oracled by a
    // first-principles recursive-CTE RDP in DuckDB (below).
    "q_rdp" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .withColumn("eps", col("eps_us").cast("double") / 1000000.0)
      Simplify.rdp(e, "user_id", "eps", "value", epsilon = 50.0)
        .select(col("user_id"), round(col("eps"), 6).as("eps"), col("value"))
        .orderBy("user_id", "eps")
    }),

    // #52 gap sessionization (batch flavor of the streaming op).
    "q_sessionize" -> ((s, dir) =>
      EventStreams.sessionize(Tables.events(s, dir), gapMs = 600000L)
        .select(col("user_id"), col("session_start_us"), col("session_end_us"),
          col("n_events"), round(col("sum_value"), 2).as("sum_value"))
        .orderBy("user_id", "session_start_us")),

    // #52 windowed aggregation (batch flavor of the streaming op —
    // same transform runs on readStream with a watermark).
    "q_windowed_agg" -> ((s, dir) =>
      EventStreams.windowedAgg(Tables.events(s, dir), "10 minutes", "30 minutes")
        .select(unix_micros(col("win_start")).as("win_start_us"), col("event_type"),
          col("cnt"), round(col("sum_value"), 2).as("sum_value"))
        .orderBy("win_start_us", "event_type")),
  )

  private val skewOracle =
    """WITH l AS (SELECT CASE WHEN l_partkey % 10 <> 0 THEN 1 ELSE l_partkey END AS k,
      |                 l_quantity FROM lineitem)
      |SELECT p_type, count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
      |FROM l JOIN part ON p_partkey = k
      |GROUP BY p_type ORDER BY p_type""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_lookup_join_bucketed" ->
      """SELECT c_mktsegment, count(*) AS cnt, round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // the PAIR shares one oracle: salting must be output-invisible
    "q_skew_join_plain" -> skewOracle,
    "q_skew_join_salted" -> skewOracle,

    "q_weighted_quantile" ->
      """WITH c AS (SELECT l_extendedprice AS v, l_quantity AS w FROM lineitem WHERE l_quantity > 0),
        |cum AS (SELECT v, sum(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cw,
        |        sum(w) OVER () AS tw FROM c)
        |SELECT q, value FROM (
        | SELECT cast(0.25 as double) AS q, round(min(v),4) AS value FROM cum WHERE cw >= 0.25*tw
        | UNION ALL SELECT 0.5, round(min(v),4) FROM cum WHERE cw >= 0.5*tw
        | UNION ALL SELECT 0.75, round(min(v),4) FROM cum WHERE cw >= 0.75*tw
        |) ORDER BY q""".stripMargin,

    "q_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS eps_us, value FROM events),
        |m AS (SELECT user_id, eps_us, value,
        |  CASE WHEN eps_us - lag(eps_us) OVER (PARTITION BY user_id ORDER BY eps_us) > 600000000
        |       THEN 1 ELSE 0 END AS brk FROM e),
        |s AS (SELECT user_id, eps_us, value,
        |  sum(brk) OVER (PARTITION BY user_id ORDER BY eps_us ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        |SELECT user_id, min(eps_us) AS session_start_us, max(eps_us) AS session_end_us,
        | cast(count(*) as int) AS n_events, round(sum(value),2) AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin,

    "q_windowed_agg" ->
      """SELECT (epoch_us(ts)//600000000)*600000000 AS win_start_us, event_type,
        | count(*) AS cnt, round(sum(value),2) AS sum_value
        |FROM events GROUP BY 1, 2
        |ORDER BY win_start_us, event_type""".stripMargin,

    // first-principles natural cubic spline: knots = per-user hourly
    // averages; the tridiagonal second-derivative system solves via
    // TWO recursive CTEs (Thomas forward sweep ascending, back
    // substitution descending — fwd is MATERIALIZED so bwd reads the
    // sweep once instead of re-running the recursion per step); every
    // arithmetic expression mirrors the Scala operand order
    // left-associatively, so both engines run the identical IEEE
    // double sequence (round-4 output matched exactly with zero
    // tolerance at sf0.01). Hour-integer knots put each half-hour
    // probe strictly inside its own interval, and the last knot's
    // probe clamps to x_max where the cubic collapses to y_max
    // exactly — so evaluation needs no interval search.
    "q_spline" ->
      """WITH RECURSIVE knots0 AS (
        |  SELECT user_id, cast(floor(epoch_us(ts)/3.6e9) AS bigint) AS hx, avg(value) AS hy
        |  FROM events GROUP BY 1, 2
        |),
        |knots AS (
        |  SELECT user_id, cast(hx AS double) AS x, hy AS y,
        |         row_number() OVER (PARTITION BY user_id ORDER BY hx) - 1 AS i,
        |         count(*) OVER (PARTITION BY user_id) AS n
        |  FROM knots0
        |),
        |interior AS (
        |  SELECT k.user_id, k.i, k.n,
        |         (kn.x - k.x) AS sup,
        |         (k.x - kp.x) AS sub,
        |         2*((k.x - kp.x) + (kn.x - k.x)) AS diag,
        |         6*((kn.y - k.y)/(kn.x - k.x) - (k.y - kp.y)/(k.x - kp.x)) AS rhs
        |  FROM knots k
        |  JOIN knots kp ON kp.user_id = k.user_id AND kp.i = k.i - 1
        |  JOIN knots kn ON kn.user_id = k.user_id AND kn.i = k.i + 1
        |  WHERE k.i BETWEEN 1 AND k.n - 2
        |),
        |fwd(user_id, i, n, diagp, rhsp, sup) AS MATERIALIZED (
        |  SELECT user_id, i, n, diag, rhs, sup FROM interior WHERE i = 1
        |  UNION ALL
        |  SELECT t.user_id, t.i, t.n,
        |         t.diag - (t.sub/f.diagp)*f.sup,
        |         t.rhs - (t.sub/f.diagp)*f.rhsp,
        |         t.sup
        |  FROM fwd f JOIN interior t ON t.user_id = f.user_id AND t.i = f.i + 1
        |),
        |bwd(user_id, i, m) AS (
        |  SELECT user_id, i, rhsp/diagp FROM fwd WHERE i = n - 2
        |  UNION ALL
        |  SELECT f.user_id, f.i, (f.rhsp - f.sup*b.m)/f.diagp
        |  FROM bwd b JOIN fwd f ON f.user_id = b.user_id AND f.i = b.i - 1
        |),
        |m AS (
        |  SELECT user_id, i, m FROM bwd
        |  UNION ALL
        |  SELECT user_id, i, 0.0 FROM knots WHERE i = 0 OR i = n - 1
        |),
        |evald AS (
        |  -- probe from knot i: px = x_i + 0.5; hour-integer knots mean the
        |  -- probe stays inside [x_i, x_{i+1}) except the last knot, which
        |  -- clamps to x_{n-1} and evaluates exactly to y_{n-1}
        |  SELECT k.user_id, k.x + 0.5 AS px, k.y AS y
        |  FROM knots k WHERE k.i = k.n - 1
        |  UNION ALL
        |  SELECT k.user_id, k.x + 0.5 AS px,
        |         ((kn.x - (k.x + 0.5))/(kn.x - k.x))*k.y
        |         + (((k.x + 0.5) - k.x)/(kn.x - k.x))*kn.y
        |         + ( (((kn.x - (k.x + 0.5))/(kn.x - k.x))*((kn.x - (k.x + 0.5))/(kn.x - k.x))*((kn.x - (k.x + 0.5))/(kn.x - k.x)) - ((kn.x - (k.x + 0.5))/(kn.x - k.x)))*ml.m
        |           + (((((k.x + 0.5) - k.x)/(kn.x - k.x))*((((k.x + 0.5) - k.x))/(kn.x - k.x))*((((k.x + 0.5) - k.x))/(kn.x - k.x)) - (((k.x + 0.5) - k.x)/(kn.x - k.x))))*mh.m
        |           )*(kn.x - k.x)*(kn.x - k.x)/6.0 AS y
        |  FROM knots k
        |  JOIN knots kn ON kn.user_id = k.user_id AND kn.i = k.i + 1
        |  JOIN m ml ON ml.user_id = k.user_id AND ml.i = k.i
        |  JOIN m mh ON mh.user_id = k.user_id AND mh.i = k.i + 1
        |  WHERE k.i < k.n - 1
        |)
        |SELECT user_id, px, round(y, 4) AS y FROM evald ORDER BY user_id, px""".stripMargin,

    // first-principles RDP as a recursive CTE: segments carry their
    // own argmax (farthest interior point from the chord, earliest
    // index on ties — exactly the Scala scan's `d > maxD` keep-first);
    // a segment with md > ε keeps its argmax and spawns both child
    // halves, whose argmaxes the recursive term computes via LATERAL.
    // Kept set = endpoints ∪ argmaxes of splitting segments ∪ all
    // points of series too short to simplify (n ≤ 2 keeps both, and a
    // 2-point series has no interior so the root never forms). The
    // distance expression mirrors the Scala operand order
    // left-associatively, so both engines run the identical IEEE
    // double sequence.
    "q_rdp" ->
      """WITH RECURSIVE pts AS (
        |  SELECT user_id, epoch_us(ts)/1000000.0 AS x, value AS y,
        |         row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), value) AS i,
        |         count(*) OVER (PARTITION BY user_id) AS n
        |  FROM events
        |),
        |roots AS (SELECT user_id, max(n) AS n FROM pts GROUP BY user_id),
        |seg(user_id, ai, ax, ay, bi, bx, by, mi, mx, my, md) AS (
        |  SELECT r.user_id, 1, pa.x, pa.y, r.n, pb.x, pb.y, m.i, m.x, m.y, m.d
        |  FROM roots r
        |  JOIN pts pa ON pa.user_id = r.user_id AND pa.i = 1
        |  JOIN pts pb ON pb.user_id = r.user_id AND pb.i = r.n
        |  CROSS JOIN LATERAL (
        |    SELECT p.i, p.x, p.y,
        |      abs((pb.y-pa.y)*p.x - (pb.x-pa.x)*p.y + pb.x*pa.y - pb.y*pa.x)
        |        / sqrt((pb.x-pa.x)*(pb.x-pa.x) + (pb.y-pa.y)*(pb.y-pa.y)) AS d
        |    FROM pts p
        |    WHERE p.user_id = r.user_id AND p.i > 1 AND p.i < r.n
        |    ORDER BY d DESC, p.i LIMIT 1
        |  ) m
        |  WHERE r.n > 2
        |  UNION ALL
        |  SELECT c.user_id, c.ai, c.ax, c.ay, c.bi, c.bx, c.by, m.i, m.x, m.y, m.d
        |  FROM (
        |    SELECT s.user_id,
        |           CASE side.s WHEN 0 THEN s.ai ELSE s.mi END AS ai,
        |           CASE side.s WHEN 0 THEN s.ax ELSE s.mx END AS ax,
        |           CASE side.s WHEN 0 THEN s.ay ELSE s.my END AS ay,
        |           CASE side.s WHEN 0 THEN s.mi ELSE s.bi END AS bi,
        |           CASE side.s WHEN 0 THEN s.mx ELSE s.bx END AS bx,
        |           CASE side.s WHEN 0 THEN s.my ELSE s.by END AS by
        |    FROM seg s CROSS JOIN (VALUES (0), (1)) side(s)
        |    WHERE s.md > 50.0
        |  ) c
        |  CROSS JOIN LATERAL (
        |    SELECT p.i, p.x, p.y,
        |      abs((c.by-c.ay)*p.x - (c.bx-c.ax)*p.y + c.bx*c.ay - c.by*c.ax)
        |        / sqrt((c.bx-c.ax)*(c.bx-c.ax) + (c.by-c.ay)*(c.by-c.ay)) AS d
        |    FROM pts p
        |    WHERE p.user_id = c.user_id AND p.i > c.ai AND p.i < c.bi
        |    ORDER BY d DESC, p.i LIMIT 1
        |  ) m
        |  WHERE c.bi - c.ai > 1
        |),
        |kept AS (
        |  SELECT user_id, i FROM pts WHERE i = 1 OR i = n
        |  UNION
        |  SELECT user_id, mi AS i FROM seg WHERE md > 50.0
        |)
        |SELECT p.user_id, round(p.x, 6) AS eps, p.y AS value
        |FROM kept k JOIN pts p ON p.user_id = k.user_id AND p.i = k.i
        |ORDER BY p.user_id, eps""".stripMargin,
  )
}
