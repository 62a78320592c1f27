package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.Engine

/** The composed ingest a real corpus pipeline runs: ONE micro-batch
  * stream (e.g. `readStream.format("vortex")` over a landing
  * directory) fans each batch into three consumers that must stay
  * consistent per batch:
  *
  *  1. the standing CORPUS — the batch lands as a vortex dataset under
  *     `epoch=<batchId>` (overwrite: a replayed batch replaces its own
  *     epoch directory, so the corpus is exactly-once per batch id);
  *  2. the DEDUP index + match log ([[DedupIngest]]): probe the
  *     standing signature index, land the batch's match partition,
  *     append the batch's own signatures (marker-gated);
  *  3. the CORPUS STATS index ([[CorpusStatsIngest]]): one df/cf
  *     segment per batch (segment overwrite ⇒ idempotent).
  *
  * Replay story: Structured Streaming redelivers a batch id after a
  * crash with the SAME data. Every consumer above is individually
  * idempotent under that contract — epoch overwrite, marker-gated
  * append + replay-residue anti-join, segment overwrite — so the
  * composition is too, in ANY sub-sink order: a crash between sinks
  * just means the replay re-runs all three and each lands exactly its
  * own batch-keyed output again.
  *
  * At 100 TB: per-batch work is O(batch + matches) — the standing
  * corpus, index, and stats are never re-read or rewritten on ingest.
  */
object IngestPipeline {

  def foreachBatchBody(e: Engine, idCol: String, textCol: String,
                       corpusDir: String, dedupIndexDir: String,
                       matchDir: String, statsDir: String, tau: Double)
      : (DataFrame, Long) => Unit = (batch, batchId) => {
    val b = batch.persist()
    try {
      DedupIngest.foreachBatchBody(e, idCol, textCol,
        dedupIndexDir, matchDir, tau)(b, batchId)
      CorpusStatsIngest.foreachBatchBody(textCol, statsDir)(b, batchId)
      b.write.format("vortex").mode("overwrite")
        .save(s"$corpusDir/epoch=$batchId")
    } finally b.unpersist()
  }
}
