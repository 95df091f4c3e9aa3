package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming over the events shape (SURVEY.md §2 #52):
  * watermarked windowed aggregation + stateful sessionization.
  * The same transforms run on `Tables.events` as a batch frame or on a
  * `readStream` source — Structured Streaming's unified model.
  */
object EventStreams {

  /** Tumbling-window counts/sums per event_type with a watermark for
    * state cleanup. Works on batch or streaming input with `ts`
    * timestamp + `event_type` + `value`. */
  def windowedAgg(events: DataFrame, windowLen: String = "10 minutes",
                  watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"), col("cnt"), col("sum_value"))

  case class SessionIn(user_id: Long, eps_us: Long, value: Double)
  case class SessionOut(user_id: Long, session_start_us: Long, session_end_us: Long,
                        n_events: Int, sum_value: Double)
  case class SessionState(start: Long, end: Long, n: Int, vsum: Double)

  /** Gap-based sessionization with mapGroupsWithState: a session closes
    * after `gapMs` without events (processing-time timeout in streams).
    * State is per-key and distributed — the canonical scalable shape. */
  def sessionize(events: DataFrame, gapMs: Long): DataFrame = {
    val ds = events.select(col("user_id").cast("long"), col("eps_us").cast("long"),
      col("value").cast("double"))
      .as(Encoders.product[SessionIn])
    ds.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroups { (uid, it) =>
        // batch analogue: walk the user's events in time order, cutting
        // sessions at gaps > gapMs (streaming uses GroupState + timeout)
        val evs = it.toArray.sortBy(_.eps_us)
        val out = List.newBuilder[SessionOut]
        var st: SessionState = null
        evs.foreach { e =>
          if (st == null) st = SessionState(e.eps_us, e.eps_us, 1, e.value)
          else if (e.eps_us - st.end > gapMs * 1000) {
            out += SessionOut(uid, st.start, st.end, st.n, st.vsum)
            st = SessionState(e.eps_us, e.eps_us, 1, e.value)
          } else st = SessionState(st.start, e.eps_us, st.n + 1, st.vsum + e.value)
        }
        if (st != null) out += SessionOut(uid, st.start, st.end, st.n, st.vsum)
        out.result().iterator
      }(Encoders.product[SessionOut])
      .toDF()
  }

  /** Streaming exact dedup for document/event feeds: drops rows whose
    * content hash was already seen, with bounded state — duplicates
    * arriving within the watermark window are suppressed, older state
    * is evicted (dropDuplicatesWithinWatermark, the streaming analogue
    * of the batch `Dedup.exact` keep-first). `tsCol` must be a
    * timestamp column; dedup state is keyed by md5(content) — 128 bits
    * like the batch path, since 64-bit keys reach birthday-collision
    * territory at billions of documents and a collision here silently
    * drops a distinct document. */
  def dedupStream(rows: DataFrame, contentCol: String, tsCol: String,
                  watermark: String = "10 minutes"): DataFrame =
    rows
      // via string so any content type hashes (bigint → binary is not a
      // valid cast; its decimal string form is)
      .withColumn("__h", md5(col(contentCol).cast("string").cast("binary")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__h")
      .drop("__h")

  /** Streaming sessionization via flatMapGroupsWithState (append
    * mode): CLOSED sessions are emitted the moment an event-time gap
    * larger than gapMs is observed; the running session stays in
    * per-key state. (Production variants add a GroupStateTimeout to
    * also close sessions on wall-clock silence; kept timeout-free here
    * so tests are deterministic.) */
  def sessionizeStream(events: DataFrame, gapMs: Long): DataFrame = {
    val ds = events.select(col("user_id").cast("long"), col("eps_us").cast("long"),
      col("value").cast("double"))
      .as(Encoders.product[SessionIn])
    ds.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[SessionIn], state: GroupState[SessionState]) => {
          val evs = rows.toArray.sortBy(_.eps_us)
          val closed = List.newBuilder[SessionOut]
          var st = state.getOption.orNull
          evs.foreach { e =>
            st =
              if (st == null) SessionState(e.eps_us, e.eps_us, 1, e.value)
              else if (e.eps_us - st.end > gapMs * 1000) {
                closed += SessionOut(uid, st.start, st.end, st.n, st.vsum)
                SessionState(e.eps_us, e.eps_us, 1, e.value)
              } else SessionState(st.start, e.eps_us, st.n + 1, st.vsum + e.value)
          }
          if (st != null) state.update(st)
          closed.result().iterator
        })(Encoders.product[SessionState], Encoders.product[SessionOut])
      .toDF()
  }
}
