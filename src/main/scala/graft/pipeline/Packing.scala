package graft.pipeline

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pre-training pipelines: assign documents
  * to fixed-size context windows ("sequences") of `budget` tokens.
  *
  * Two shapes, matching the two packing disciplines used in practice:
  *
  *  1. [[chunkPack]] — GPT-style concat-and-chunk: within a shard,
  *     documents are concatenated in a deterministic order and the
  *     token stream is cut every `budget` tokens; a document may
  *     straddle a sequence boundary. Pure window arithmetic (one
  *     cumulative sum per shard), so it is fully relational and has a
  *     DuckDB oracle.
  *
  *  2. [[binPack]] — no-split packing: each document lands whole in
  *     exactly one sequence; best-fit-decreasing per shard minimizes
  *     wasted budget. Sequential by nature, so it runs as a
  *     per-partition scan (mapPartitions) after a single shard
  *     exchange — deterministic, but not SQL-expressible (rows-only
  *     check + PackingSpec quality/validity properties).
  *
  * Scale: sharding is a stable md5 of the document id (engine- and
  * cluster-size-portable, same discipline as
  * [[graft.pipeline.Curation.hashBucket]]). All windows/scans are
  * per-shard — shard count is the parallelism knob, no global sort or
  * driver state anywhere, so 100 TB just means more shards. At 1000
  * executors you'd set shards ≈ a few × total cores; each shard's
  * window is an independent partition-local sort of ~(rows/shards)
  * entries.
  */
object Packing {

  /** Stable shard in [0, shards) from [[Curation.md5Long]]. */
  def shardOf(c: Column, shards: Int): Column =
    Curation.md5Long(c) % shards

  /** Concat-and-chunk packing. `idCol` must be unique — it is the
    * total order of each shard's stream; duplicate ids would make the
    * cumulative offsets tie-ambiguous in any engine. Output per
    * document (tokens > 0):
    * (idCol, shard, n_tokens, tok_start, seq_first, seq_last) where
    * tok_start is the document's offset in its shard's token stream
    * and seq_first/seq_last the fixed-size sequences its tokens land
    * in (seq_last > seq_first ⇔ the document straddles a boundary).
    * Zero-token documents contribute nothing to the stream and are
    * dropped, mirroring what a tokenizer-fed packer sees. */
  def chunkPack(df: DataFrame, idCol: String, textCol: String,
                budget: Int, shards: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol),
        shardOf(col(idCol), shards).as("shard"),
        size(TextAnalysis.words(col(textCol))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("tok_start", sum("n_tokens").over(w) - col("n_tokens"))
      .withColumn("seq_first", floor(col("tok_start") / budget))
      .withColumn("seq_last",
        floor((col("tok_start") + col("n_tokens") - 1) / budget))
  }

  /** Grouped / curriculum concat-and-chunk: [[chunkPack]] with the
    * additional constraints a curated pre-training mix needs —
    * sequences NEVER cross a `groupCol` boundary (language, source,
    * license tier … each group gets its own shard set and its own
    * sequence numbering), and within a (group, shard) stream documents
    * are concatenated in curriculum order (`orderCol` ascending — e.g.
    * a difficulty or quality score — with the id as deterministic
    * tie-break) instead of raw id order. With `orderCol = None` the
    * order is id, i.e. plain per-group chunking.
    *
    * Same window-arithmetic shape as [[chunkPack]] (one cumulative sum
    * per (group, shard) window — fully relational, DuckDB-oracled), so
    * it scales identically: groups × shards is the parallelism knob
    * and no group ever needs to fit anywhere in particular. Output:
    * (idCol, groupCol, shard, n_tokens, tok_start, seq_first,
    * seq_last), sequence numbers per (group, shard). */
  def chunkPackByGroup(df: DataFrame, idCol: String, textCol: String,
                       groupCol: String, budget: Int, shards: Int,
                       orderCol: Option[String] = None): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    // the generated shard/n_tokens aliases and the double-selected
    // group column would otherwise surface as ambiguous-reference
    // analysis errors mid-plan
    require(!orderCol.contains(groupCol),
      s"orderCol must differ from groupCol ($groupCol) — group streams are already contiguous")
    Seq(Some(idCol), Some(groupCol), orderCol).flatten.foreach(c =>
      require(c != "shard" && c != "n_tokens",
        s"column name '$c' collides with a generated packing column"))
    val ord = orderCol.map(c => col(c).asc).toSeq :+ col(idCol).asc
    val w = Window.partitionBy(col(groupCol), col("shard")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = orderCol.filter(_ != idCol).map(col).toSeq
    df.select(col(idCol) +: col(groupCol) +: carried :+
        shardOf(col(idCol), shards).as("shard") :+
        size(TextAnalysis.words(col(textCol))).cast("long").as("n_tokens"): _*)
      .filter(col("n_tokens") > 0)
      .withColumn("tok_start", sum("n_tokens").over(w) - col("n_tokens"))
      .withColumn("seq_first", floor(col("tok_start") / budget))
      .withColumn("seq_last",
        floor((col("tok_start") + col("n_tokens") - 1) / budget))
      .select(col(idCol), col(groupCol), col("shard"), col("n_tokens"),
        col("tok_start"), col("seq_first"), col("seq_last"))
  }

  /** Sliding-window chunking: each document's token sequence splits
    * into windows of `maxLen` tokens whose starts advance by `stride`
    * (stride < maxLen ⇒ overlap — the standard overflowing-tokens
    * shape for LM training, where the overlap preserves context across
    * window boundaries). A window is emitted iff it is the document's
    * first or its predecessor did not already reach the end of the
    * document, so the tail is covered and nothing is emitted past it;
    * the last window may be short. Zero-token documents emit nothing.
    * Output: (idCol, win_id, start, win_tokens, win_text).
    *
    * Scale shape: one per-row sequence/filter/explode projection —
    * NO shuffle, NO window function; output volume is
    * Σ ceil(max(n−maxLen, 0)/stride + 1) rows, each independent, so
    * the operator is embarrassingly parallel at any corpus size. */
  def slidingWindows(df: DataFrame, idCol: String, textCol: String,
                     maxLen: Int, stride: Int): DataFrame = {
    require(maxLen > 0, s"maxLen must be positive, got $maxLen")
    require(stride > 0 && stride <= maxLen,
      s"stride must be in [1, maxLen], got $stride")
    df.withColumn("__ws", TextAnalysis.words(col(textCol)))
      .withColumn("__n", size(col("__ws")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__ws"),
        explode(expr(
          s"filter(sequence(0, __n - 1, $stride), s -> s = 0 OR s - $stride + $maxLen < __n)"))
          .as("start"))
      .select(col(idCol),
        (col("start") / stride).cast("long").as("win_id"),
        col("start").cast("long").as("start"),
        expr(s"slice(__ws, start + 1, $maxLen)").as("__wt"))
      .select(col(idCol), col("win_id"), col("start"),
        size(col("__wt")).cast("long").as("win_tokens"),
        array_join(col("__wt"), " ").as("win_text"))
  }

  /** binPack/packStream carry the id through typed (Long) encoders —
    * fail loudly on a non-integral id column instead of silently
    * null-casting (which would kill an executor task with an opaque
    * encoder NPE) or re-ordering numerically vs the batch window's
    * string order. [[chunkPack]] keeps the id column as-is and has no
    * such restriction. */
  private[graft] def requireIntegralId(df: org.apache.spark.sql.DataFrame, idCol: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val dt = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"$idCol must be an integral type for typed packing, got $dt")
  }

  case class PackIn(id: Long, shard: Long, n_tokens: Long)
  case class PackOut(doc_id: Long, shard: Long, n_tokens: Long,
                     tok_start: Long, seq_first: Long, seq_last: Long)

  /** Streaming concat-and-chunk: documents arriving on a stream are
    * appended to their shard's token stream in arrival order (doc-id
    * order within each micro-batch), and sequence assignments are
    * emitted incrementally. State per shard is ONE long — the shard's
    * token cursor — so state size is `shards`, not corpus-sized, and
    * never needs a watermark to stay bounded. Fed the same documents
    * in id order, the emitted assignments are row-identical to the
    * batch [[chunkPack]] (pinned by CurationOpsSpec).
    *
    * Works on a `readStream` source (append mode) and, because
    * flatMapGroupsWithState also runs in batch, on a static frame. */
  def packStream(docs: org.apache.spark.sql.DataFrame, idCol: String,
                 textCol: String, budget: Int, shards: Int): org.apache.spark.sql.DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    requireIntegralId(docs, idCol) // schema is known for streams too
    import org.apache.spark.sql.{Encoders => E}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val ds = docs.select(col(idCol).cast("long").as("id"),
        shardOf(col(idCol), shards).as("shard"),
        size(TextAnalysis.words(col(textCol))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .as(E.product[PackIn])
    ds.groupByKey(_.shard)(E.scalaLong)
      .flatMapGroupsWithState[Long, PackOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (shard: Long, rows: Iterator[PackIn], state: GroupState[Long]) => {
          var cursor = state.getOption.getOrElse(0L)
          // id order within the micro-batch keeps replays deterministic
          val out = rows.toArray.sortBy(_.id).map { d =>
            val start = cursor
            cursor += d.n_tokens
            PackOut(d.id, shard, d.n_tokens, start,
              start / budget, (start + d.n_tokens - 1) / budget)
          }
          state.update(cursor)
          out.iterator
        })(E.scalaLong, E.product[PackOut])
      .toDF()
  }

  /** Best-fit-decreasing bin packing, one bin set per shard. Output:
    * (idCol, shard, n_tokens, bin) — bins are numbered 0.. per shard
    * in creation order. Documents longer than `budget` get a bin of
    * their own (flagged oversize=true) rather than failing the run —
    * at corpus scale a handful of monster documents must not abort a
    * pack job; callers split or drop them downstream.
    *
    * Determinism: candidates are processed in (n_tokens desc, id asc)
    * order within each shard, and the shard exchange puts each shard
    * wholly inside one partition, so output is independent of input
    * partitioning. Best-fit lookup is a TreeMap keyed by remaining
    * capacity — O(log bins) per document. */
  def binPack(df: DataFrame, idCol: String, textCol: String,
              budget: Int, shards: Int): DataFrame =
    binPackCore(df, idCol, textCol, lit(""), budget, shards)
      .drop("group")

  /** [[binPack]] with bin sets per (groupCol, shard): a bin never
    * mixes groups (language/source/license purity for no-split
    * packing), each group numbering its bins independently. Output
    * adds the group: (idCol, group, shard, n_tokens, bin, oversize).
    * Scale is unchanged — the exchange key gains the group, so skewed
    * group sizes spread over `shards` sub-shards exactly like the
    * ungrouped path. */
  def binPackByGroup(df: DataFrame, idCol: String, textCol: String,
                     groupCol: String, budget: Int, shards: Int): DataFrame =
    binPackCore(df, idCol, textCol, col(groupCol).cast("string"), budget, shards)

  private def binPackCore(df: DataFrame, idCol: String, textCol: String,
                          group: Column, budget: Int, shards: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    requireIntegralId(df, idCol)
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df.select(col(idCol).cast("long").as("id"),
        group.as("group"),
        shardOf(col(idCol), shards).as("shard"),
        size(TextAnalysis.words(col(textCol))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .repartition(col("group"), col("shard"))
      .sortWithinPartitions(col("group"), col("shard"), col("n_tokens").desc, col("id"))
      .as[(Long, String, Long, Long)]
    val packed = prepared.mapPartitions { rows =>
      // a partition holds whole (group, shard) runs (possibly several)
      // — reset the packer whenever the key changes
      var shard = Long.MinValue
      var grp: String = null
      // remaining capacity -> bin ids with exactly that remaining, in
      // creation order (first-created wins ties for determinism)
      var open: java.util.TreeMap[Long, scala.collection.mutable.Queue[Long]] = null
      var nextBin = 0L
      rows.map { case (id, g, sh, toks) =>
        if (sh != shard || g != grp) {
          shard = sh
          grp = g
          open = new java.util.TreeMap[Long, scala.collection.mutable.Queue[Long]]()
          nextBin = 0L
        }
        if (toks > budget) { // oversize: solo bin, never opened for reuse
          val bin = nextBin; nextBin += 1
          (id, g, sh, toks, bin, true)
        } else {
          val fit = open.ceilingEntry(toks)
          if (fit == null) { // nothing fits: open a new bin
            val bin = nextBin; nextBin += 1
            val rem = budget - toks
            if (rem > 0)
              open.computeIfAbsent(rem, _ => scala.collection.mutable.Queue.empty)
                .enqueue(bin)
            (id, g, sh, toks, bin, false)
          } else { // tightest remaining capacity that fits (best fit)
            val q = fit.getValue
            val bin = q.dequeue()
            if (q.isEmpty) open.remove(fit.getKey)
            val rem = fit.getKey - toks
            if (rem > 0)
              open.computeIfAbsent(rem, _ => scala.collection.mutable.Queue.empty)
                .enqueue(bin)
            (id, g, sh, toks, bin, false)
          }
        }
      }
    }.toDF("id", "group", "shard", "n_tokens", "bin", "oversize")
    packed.withColumnRenamed("id", idCol)
  }
}
