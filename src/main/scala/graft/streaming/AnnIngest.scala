package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Engine

/** Streaming ANN ingest: the stored-IVF lifecycle (build → probe →
  * append) wired into Structured Streaming — the vector twin of
  * [[DedupIngest]].
  *
  * Each micro-batch of embeddings
  *  1. probes the standing IVF index for its top-k nearest neighbors
  *     (`Engine.annSearchIndex` — queries assign to the stored
  *     centroids, only the probed clusters' partitions are planned;
  *     the corpus is never re-read whole);
  *  2. lands its (query, neighbor, cos, rank) rows as one parquet
  *     partition keyed by batch id (a replay OVERWRITES its own
  *     partition);
  *  3. appends its own vectors into their clusters' partitions so
  *     later batches see them (`Engine.appendAnnIndex` — append-only,
  *     the standing index is never rewritten).
  *
  * Replay idempotence differs from the dedup twin in one important
  * way: matches here are RANKED top-k, not threshold-filtered, so the
  * batch's own ids must leave the candidate pool BEFORE ranking — an
  * after-the-fact anti-join would let a replayed batch's own vectors
  * consume rank slots and shrink/shift the emitted top-k. The
  * `excludeIds` pass-through of `annSearchIndex` does exactly that,
  * making the emitted set "top-k against the standing corpus as of
  * batch start" on first run and replay alike.
  *
  * The `_ingested/batch_<id>` marker is written AFTER the append
  * (same trade as [[DedupIngest]]): a crash between the two can
  * double one batch's index rows until the replay completes;
  * duplicated rows only duplicate CANDIDATES, which the probe
  * collapses per (id_q, id_n) before ranking, so probe output is
  * unchanged — disclosed, not hidden.
  *
  * At 100 TB: per-batch work is O(batch × probed-cluster rows); the
  * index grows by exactly the batch's cluster files. Centroids drift
  * as the corpus grows — rebuild via `Engine.buildAnnIndex` when
  * recall degrades (the standard IVF trade).
  */
object AnnIngest {

  /** The `(batch, batchId) => Unit` body for
    * `embeddings.writeStream.foreachBatch(...)`. `batch` must carry
    * `idCol` (integral) and `vecCol` (64-dim float array). */
  def foreachBatchBody(engine: Engine, idCol: String, vecCol: String,
                       indexDir: String, matchDir: String, k: Int = 3)
      : (DataFrame, Long) => Unit = (batch, batchId) => {
    val spark = engine.spark
    val fs = new Path(indexDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(s"$indexDir/_ingested/batch_$batchId")
    val b = batch.persist()
    try {
      val batchIds = b.select(col(idCol).cast("long").as("id"))
      engine.annSearchIndex(b, idCol, vecCol, indexDir, k,
          excludeIds = Some(batchIds))
        .withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .save(s"$matchDir/batch_id=$batchId") // replay overwrites itself
      if (!fs.exists(marker)) {
        engine.appendAnnIndex(b, idCol, vecCol, indexDir)
        fs.mkdirs(marker)
      }
    } finally b.unpersist()
  }
}
