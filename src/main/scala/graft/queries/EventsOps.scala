package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Time-windowed analytics over `events` — the batch form of the
  * Structured Streaming pipeline (same `window()` semantics; the
  * streaming variant with watermarks lives in graft.streaming and is
  * exercised by tests). Epoch-aligned tumbling windows match DuckDB's
  * time_bucket.
  */
object EventsOps {
  val set = new QuerySet
  import set._

  // Long-cents sum instead of a decimal aggregate: `value` is 2-decimal
  // by construction, so round(value*100) is exact per value (asserted
  // against CAST(value AS DECIMAL(18,2)) over every SF) and the long
  // SUM stays inside whole-stage codegen — measured 0.76 → 0.54 s at
  // sf1. Output is bounded by hours×event_types → TinyResult ordering.
  spark("e_window_tumbling",
    (s, d) => graft.operators.TinyResult.globalSort(
      Tables.t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          (sum(expr("CAST(round(value * 100) AS BIGINT)"))
            .cast(DecimalType(20, 0)) / lit(100)).cast("double").as("sum_v"))
        .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_v")),
      col("ws"), col("event_type")),
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type, count(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
      |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin)

  // bounded hours×types output → TinyResult ordering skips the range
  // sampling that re-ran the expand+aggregate (0.54 → 0.44 s at sf1)
  spark("e_sliding_window",
    (s, d) => graft.operators.TinyResult.globalSort(
      Tables.t(s, d, "events")
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("ws"), col("event_type"), col("n")),
      col("ws"), col("event_type")),
    """WITH s AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS hb, event_type FROM events),
      |w AS (SELECT hb - INTERVAL 1 HOUR AS ws, event_type FROM s
      |      UNION ALL SELECT hb AS ws, event_type FROM s)
      |SELECT ws, event_type, count(*) AS n FROM w GROUP BY ws, event_type
      |ORDER BY ws, event_type""".stripMargin)

  // Batch sessionization: gap>30min starts a new session (window-based
  // twin of graft.streaming.EventPipelines.sessionize — the scalable
  // two-window shape: lag→break flags→running session ids→group).
  spark("e_sessions",
    (s, d) => { Tables.registerAll(s, d)
      s.sql("""WITH g AS (
              |  SELECT user_id, ts, event_id, value,
              |    CASE WHEN lag(ts) OVER w IS NULL
              |           OR unix_micros(CAST(ts AS TIMESTAMP)) - unix_micros(CAST(lag(ts) OVER w AS TIMESTAMP)) > 1800000000
              |         THEN 1 ELSE 0 END AS brk
              |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
              |                              ROWS UNBOUNDED PRECEDING) AS sid FROM g)
              |SELECT user_id, CAST(sid AS BIGINT) AS sid, count(*) AS n, min(ts) AS session_start, max(ts) AS session_end,
              |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
              |FROM s GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin) },
    """WITH g AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                              ROWS UNBOUNDED PRECEDING) AS sid FROM g)
      |SELECT user_id, CAST(sid AS BIGINT) AS sid, count(*) AS n, min(ts) AS session_start, max(ts) AS session_end,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
      |FROM s GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin)

  // Per-user event sequencing: gap to previous event in exact
  // microseconds (integer arithmetic — no interval-boundary semantics
  // to diverge between engines). Batch analog of sessionization state.
  spark("e_user_gaps",
    // checkpoint-before-ordered-dump A/B (r15 optimization round):
    // pinning the window output before the final sort (the w1/j7 shape)
    // measured WORSE at sf1 — 1.77 -> 2.06 s warm BenchOne — because
    // this window core is cheap relative to pinning 1M rows; the
    // sampler's re-run of sort+window over the already-materialized
    // user_id shuffle costs less than the pin. Left as the plain
    // ORDER BY deliberately.
    (s, d) => { Tables.registerAll(s, d)
      s.sql("""SELECT event_id, user_id,
              |  unix_micros(CAST(ts AS TIMESTAMP)) - unix_micros(CAST(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS TIMESTAMP)) AS gap_us
              |FROM events ORDER BY event_id""".stripMargin) },
    """SELECT event_id, user_id,
      |  epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
      |FROM events ORDER BY event_id""".stripMargin)

  // ---- §2.8 oracle-checked STREAMING row (r15; VERDICT r14 next #7) --

  /** events staged as a 4-file parquet landing dir (marker-guarded,
    * outside any timed region) — the micro-batch stream's source. */
  private def stageLanding(s: org.apache.spark.sql.SparkSession, d: String): String = {
    val sf = new java.io.File(d).getName
    val dir = s"${sys.props("java.io.tmpdir")}/graft_stream/$sf/events_landing"
    val src = new java.io.File(s"$d/events.parquet")
    val fp = s"${src.length}:${src.lastModified}:v1"
    val marker = new java.io.File(dir, "_graft_ready") // _-prefixed: the file stream source ignores it
    val fresh = marker.exists &&
      (try java.nio.file.Files.readString(marker.toPath) == fp
       catch { case _: Exception => false })
    if (!fresh) {
      Tables.t(s, d, "events").repartition(4)
        .write.mode("overwrite").parquet(dir)
      java.nio.file.Files.writeString(marker.toPath, fp)
    }
    dir
  }

  // The batch e_window_tumbling computed THROUGH an actual micro-batch
  // stream: readStream over the landing dir (2 files per trigger → ≥2
  // batches with aggregation state carried across), complete-mode
  // windowed aggregation (EventPipelines.windowedAggCents — long-cents
  // partials, so the result is bit-exact regardless of batch order),
  // each trigger overwriting the vortex SINK (the epoch-overwrite
  // idempotence of IngestPipeline: a replayed trigger rewrites the same
  // answer). The row returns the SINK's contents, so the oracle hash
  // proves the STREAMED result — watermarks/state/trigger machinery
  // included — equals the batch answer. Complete-mode state is bounded
  // by hours × event types (the same bound that makes the batch row's
  // output tiny), not by the stream's length. Bench note: the timed
  // region deliberately contains the whole stream run (checkpoint,
  // triggers, state store, sink) vs DuckDB's one-shot batch aggregate —
  // a disclosed-asymmetric machinery row like the s3/s4 write rows.
  spark("e_stream_tumbling",
    (s, d) => {
      val landing = stageLanding(s, d)
      val sf = new java.io.File(d).getName
      // per-process sink (review-found r15 — the TwinPfx lesson): two
      // concurrent runs must not overwrite each other's sink mid-read.
      // The landing stays shared: it is marker-guarded and re-staged
      // only when the source parquet itself changed.
      val sinkParent = new java.io.File(
        s"${sys.props("java.io.tmpdir")}/graft_stream/$sf")
      // age-sweep dead sibling sinks (same discipline as TwinPfx)
      val cutoff = System.currentTimeMillis() - 6L * 3600 * 1000
      Option(sinkParent.listFiles()).foreach(_.foreach { f =>
        if (f.getName.startsWith("tumbling_sink_p") && f.lastModified() < cutoff) {
          def rm(x: java.io.File): Unit = {
            Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
          }
          rm(f)
        }
      })
      val sink = s"${sinkParent.getPath}/" +
        s"tumbling_sink_p${ProcessHandle.current().pid()}"
      val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ckpt").toString
      val schema = Tables.t(s, d, "events").schema
      val ev = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "2").parquet(landing)
        // watermarks demand TIMESTAMP (not NTZ); the session TZ is UTC
        // on both engines, so the round trip is value-preserving — the
        // sink casts ws back to NTZ to match the batch oracle's schema
        .withColumn("ts", col("ts").cast("timestamp"))
      val q = graft.streaming.EventPipelines.windowedAggCents(ev)
        .withColumn("ws", col("ws").cast("timestamp_ntz"))
        .writeStream
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          df.write.format("vortex").mode("overwrite").save(sink)
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally { // checkpoint is per-run scratch — don't leak it (r15 review)
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(new java.io.File(ckpt))
      }
      graft.operators.TinyResult.globalSort(
        s.read.format("vortex").load(sink),
        col("ws"), col("event_type"))
    },
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type, count(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
      |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin)
}
