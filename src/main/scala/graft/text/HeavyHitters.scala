package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Heavy hitters (most frequent tokens) over a corpus.
  *
  * [[exact]] is the ground truth: one map-side-combinable hash
  * aggregation on the token, then a global top-k via
  * TakeOrderedAndProject (per-partition heaps of k, no global sort).
  *
  * [[withCmsEstimates]] carries the sketch path next to it: a
  * Count-Min sketch (Cormode–Muthukrishnan; Spark's built-in
  * `count_min_sketch` aggregate — one pass, map-side mergeable,
  * sketch size depth×width independent of cardinality) estimates the
  * same candidates' counts. The CMS guarantee — estimate ≥ true count,
  * and ≤ true + ε·N with probability ≥ confidence — is pinned by
  * SketchSpec against the exact counts. At 100 TB the sketch is the
  * shape that survives: its size never grows with the vocabulary, so
  * frequency queries cost one scan + a constant-size merge instead of
  * a vocabulary-wide shuffle; candidates then come from per-partition
  * local top-m heaps (SpaceSaving-style) rather than the exact
  * aggregate used here for oracle determinism.
  */
object HeavyHitters {

  /** Exact top-k tokens: (tok, cnt), count-desc then token-asc. */
  def exact(df: DataFrame, textCol: String, k: Int): DataFrame =
    graft.Parallelism.spread(df)
      .select(explode(TextAnalysis.words(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(k)

  /** The 100 TB top-k shape: NO vocabulary-wide shuffle. Pass 1 runs
    * a SpaceSaving summary (Metwally et al. 2005) of `m` counters per
    * partition — any token with partition-local count ≥ n_p/m survives
    * its partition, so the union of per-partition survivors is a
    * SUPERSET of every token with global count ≥ N/m; with k ≪ m the
    * true top-k is inside it. Pass 2 broadcast-semi-joins the ≤
    * partitions·m candidates back onto the token stream and counts
    * EXACTLY those — the aggregation shuffles only candidate rows, so
    * the result is exact top-k (same oracle as [[exact]]) while the
    * full vocabulary never crosses the wire. */
  def topKScalable(df: DataFrame, textCol: String, k: Int, m: Int = 4096): DataFrame = {
    require(k > 0 && m >= k, s"need m >= k > 0, got k=$k m=$m")
    val spark = df.sparkSession
    import spark.implicits._
    val toks = graft.Parallelism.spread(df)
      .select(explode(TextAnalysis.words(col(textCol))).as("tok"))
    val candidates = toks.as[String].mapPartitions { it =>
      // SpaceSaving with m counters: on overflow, the minimum counter
      // is reassigned to the new item with count min+1
      val counts = new java.util.HashMap[String, Long](m * 2)
      it.foreach { t =>
        if (counts.containsKey(t)) counts.put(t, counts.get(t) + 1)
        else if (counts.size < m) counts.put(t, 1L)
        else {
          // O(m) min scan per eviction — evictions are rare on skewed
          // token streams (the heavy mass increments existing counters);
          // a production kernel would keep a min-heap beside the map
          var minK: String = null; var minV = Long.MaxValue
          val e = counts.entrySet().iterator()
          while (e.hasNext) { val x = e.next(); if (x.getValue < minV) { minV = x.getValue; minK = x.getKey } }
          counts.remove(minK)
          counts.put(t, minV + 1)
        }
      }
      import scala.jdk.CollectionConverters._
      counts.keySet().asScala.iterator
    }.toDF("tok").distinct()
    toks.join(broadcast(candidates), Seq("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(k)
  }

  /** Exact top-k with the Count-Min estimate alongside:
    * (tok, cnt, cnt_cms). Deterministic for a fixed seed. */
  def withCmsEstimates(df: DataFrame, textCol: String, k: Int,
                       eps: Double = 0.001, confidence: Double = 0.99,
                       seed: Int = 42): DataFrame = {
    val toks = graft.Parallelism.spread(df)
      .select(explode(TextAnalysis.words(col(textCol))).as("tok"))
    val bytes = toks
      .agg(count_min_sketch(col("tok"), lit(eps), lit(confidence), lit(seed)))
      .first().getAs[Array[Byte]](0)
    val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
    val top = exact(df, textCol, k).collect() // k rows — driver-tiny
    val spark = df.sparkSession
    import spark.implicits._
    top.toSeq.map { r =>
      val tok = r.getString(0)
      // the SQL aggregate feeds UTF8String bytes into the sketch, so
      // probe with the same representation
      (tok, r.getLong(1),
        cms.estimateCount(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    }.toDF("tok", "cnt", "cnt_cms")
  }
}
