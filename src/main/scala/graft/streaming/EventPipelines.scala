package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming pipelines over the `events` stream (north-star
  * addition — the reference has no streaming surface, SURVEY.md §2.8).
  * Each transform takes a streaming (or batch — same semantics)
  * DataFrame with columns (event_id, ts timestamp, user_id, event_type,
  * value, props).
  *
  * Scale notes: watermarks bound state; windowed aggs are partial+final
  * over (window, type) keys; sessionization state is per-user and
  * evicted by event-time timeout — all shapes that hold on an
  * unbounded 100 TB/day stream.
  */
object EventPipelines {

  /** Tumbling-window counts + sums with a late-data watermark. */
  def windowedAgg(events: DataFrame, watermark: String = "10 minutes",
                  window_ : String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_v"))

  /** [[windowedAgg]]'s exact-sum twin for oracle hashing (r15,
    * VERDICT r14 next #7): partial sums accumulate as long CENTS —
    * order-independent across micro-batches and partitions — so the
    * streamed result hash-matches the batch `e_window_tumbling`
    * oracle bit-for-bit (the same trick that row uses; a double sum's
    * last ulp would depend on batch arrival order). */
  def windowedAggCents(events: DataFrame, watermark: String = "10 minutes",
                       window_ : String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"),
        (col("cents").cast(org.apache.spark.sql.types.DecimalType(20, 0)) / lit(100))
          .cast("double").as("sum_v"))

  /** Sliding-window event rate per type. */
  def slidingRate(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

  /** Exactly-once style dedup by event_id bounded by the watermark. */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")

  /** Streaming CONTENT dedup for a document stream: whitespace-
    * canonicalized lowercase md5 fingerprint (the same canon as
    * `Engine.fingerprint`), deduplicated within the watermark horizon.
    * The streaming twin of the batch exact-dedup family — state is one
    * 16-byte digest per distinct document inside the horizon, evicted
    * by the watermark, so an unbounded stream holds bounded state. */
  def dedupContent(docs: DataFrame, textCol: String, tsCol: String,
                   watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("__fp",
        md5(lower(regexp_replace(col(textCol), "\\s+", " "))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class Session(user_id: Long, start: java.sql.Timestamp,
                           end: java.sql.Timestamp, n_events: Long, sum_value: Double)
  final case class SessionState(start: Long, end: Long, n: Long, sumv: Double)

  /** Gap-based sessionization with custom keyed state
    * (flatMapGroupsWithState + event-time timeout): a session closes
    * after `gapMinutes` of per-user inactivity.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def fn(userId: Long, rows: Iterator[Event],
           state: GroupState[SessionState]): Iterator[Session] = {
      def toSession(s: SessionState) = Session(userId,
        new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end), s.n, s.sumv)
      if (state.hasTimedOut) {
        val out = state.getOption.map(toSession).iterator
        state.remove()
        out
      } else {
        var closed = List.empty[Session]
        var cur = state.getOption
        rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.end <= gapMs =>
              cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1, s.sumv + e.value))
            case Some(s) =>
              closed ::= toSession(s)
              cur = Some(SessionState(t, t, 1, e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.end + gapMs)
        }
        closed.reverseIterator
      }
    }

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
