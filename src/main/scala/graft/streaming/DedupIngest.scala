package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Engine

/** Streaming daily-ingest dedup: the §2.11 stored-index lifecycle
  * (build → probe → append) wired into Structured Streaming.
  *
  * Each micro-batch of documents
  *  1. probes the standing corpus signature index — only the BATCH is
  *     tokenized and hashed, the corpus is never re-read
  *     (`Engine.dedupAgainstIndex`);
  *  2. lands its (batch doc, corpus doc, jaccard) matches as one
  *     parquet partition keyed by batch id (a replay OVERWRITES its
  *     own partition — the match output is idempotent);
  *  3. appends its own signatures so every later batch dedups against
  *     it too (`Engine.appendDedupIndex` — append-only files, the
  *     standing index is never rewritten).
  *
  * Restart semantics: a `_ingested/batch_<id>` marker makes the index
  * append idempotent under Structured Streaming's batch replay — a
  * replayed id re-emits matches (overwriting its own partition) but
  * skips the re-append. The marker is written AFTER the append, so a
  * crash between the two can leave one batch's signatures doubled
  * until the replay completes; duplicate signatures only duplicate
  * CANDIDATES, and candidates are verified and emitted per (bid, cid)
  * pair, so the match set is unchanged — disclosed, not hidden.
  *
  * At 100 TB: per-batch work is O(batch + matches); the index grows by
  * exactly the batch's sets/bands files. The composition is the
  * streaming twin of the batch `d_incremental_stored` row.
  */
object DedupIngest {

  /** The `(batch, batchId) => Unit` body for
    * `docs.writeStream.foreachBatch(...)`. `docs` must carry `idCol`
    * (integral) and `textCol` (string). */
  def foreachBatchBody(engine: Engine, idCol: String, textCol: String,
                       indexDir: String, matchDir: String, tau: Double)
      : (DataFrame, Long) => Unit = (batch, batchId) => {
    val spark = engine.spark
    val fs = new Path(indexDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(s"$indexDir/_ingested/batch_$batchId")
    val b = batch.persist()
    // nested try/finally: if dedupAgainstIndex itself throws, the outer
    // finally still unpersists b — under batch replay a leaked cached
    // batch would otherwise re-leak on every retry
    try {
      val matches = engine.dedupAgainstIndex(b, idCol, textCol, indexDir, tau)
      try {
        // The emitted set is "matches against the STANDING corpus as of
        // batch start". On a replay the batch's own signatures are
        // already in the index (the marker skipped the re-append), so
        // the probe would also surface the batch against ITSELF — both
        // self-pairs and intra-batch near-dup pairs the original run
        // never saw. Anti-joining cid against the batch's ids removes
        // exactly that replay residue (doc ids are globally unique), so
        // the overwrite really is idempotent.
        val batchIds = b.select(col(idCol).cast("long").as("__bid_filter"))
        matches
          .join(broadcast(batchIds), col("cid") === col("__bid_filter"), "left_anti")
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .save(s"$matchDir/batch_id=$batchId") // replay overwrites itself
        if (!fs.exists(marker)) {
          engine.appendDedupIndex(b, idCol, textCol, indexDir)
          fs.mkdirs(marker)
        }
      } finally {
        matches.unpersist() // dedupAgainstIndex hands back a persisted frame
      }
    } finally {
      b.unpersist()
    }
  }
}
