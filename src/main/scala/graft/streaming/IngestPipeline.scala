package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.Engine

/** The composed ingest a real corpus pipeline runs: ONE micro-batch
  * stream (e.g. `readStream.format("vortex")` over a landing
  * directory) fans each batch into four consumers that must stay
  * consistent per batch:
  *
  *  1. the standing CORPUS — the batch lands as a vortex dataset under
  *     `epoch=<batchId>` (overwrite: a replayed batch replaces its own
  *     epoch directory, so the corpus is exactly-once per batch id);
  *  2. the DEDUP index + match log ([[DedupIngest]]): probe the
  *     standing signature index, land the batch's match partition,
  *     append the batch's own signatures (marker-gated);
  *  3. the CORPUS STATS index ([[CorpusStatsIngest]]): one df/cf
  *     segment per batch (segment overwrite ⇒ idempotent);
  *  4. (when the batch carries an embedding column) the ANN index +
  *     nearest-neighbor log ([[AnnIngest]]): probe the standing IVF
  *     index for each batch vector's top-k, land the batch's match
  *     partition, append the batch's vectors (marker-gated).
  *
  * Replay story: Structured Streaming redelivers a batch id after a
  * crash with the SAME data. Every consumer above is individually
  * idempotent under that contract — epoch overwrite, marker-gated
  * append + replay-residue anti-join, segment overwrite, marker-gated
  * vector append + pre-ranking self-exclusion — so the composition is
  * too, in ANY sub-sink order: a crash between sinks just means the
  * replay re-runs all four and each lands exactly its own batch-keyed
  * output again.
  *
  * At 100 TB: per-batch work is O(batch + matches) — the standing
  * corpus, indexes, and stats are never re-read or rewritten on ingest.
  */
object IngestPipeline {

  def foreachBatchBody(e: Engine, idCol: String, textCol: String,
                       corpusDir: String, dedupIndexDir: String,
                       matchDir: String, statsDir: String, tau: Double)
      : (DataFrame, Long) => Unit =
    foreachBatchBody(e, idCol, textCol, corpusDir, dedupIndexDir,
      matchDir, statsDir, tau, ann = None)

  /** `ann = Some((vecCol, annIndexDir, annMatchDir, k))` adds the ANN
    * consumer — the batch must carry `vecCol` (embedding array). */
  def foreachBatchBody(e: Engine, idCol: String, textCol: String,
                       corpusDir: String, dedupIndexDir: String,
                       matchDir: String, statsDir: String, tau: Double,
                       ann: Option[(String, String, String, Int)])
      : (DataFrame, Long) => Unit = (batch, batchId) => {
    val b = batch.persist()
    try {
      DedupIngest.foreachBatchBody(e, idCol, textCol,
        dedupIndexDir, matchDir, tau)(b, batchId)
      CorpusStatsIngest.foreachBatchBody(textCol, statsDir)(b, batchId)
      ann.foreach { case (vecCol, annIndexDir, annMatchDir, k) =>
        AnnIngest.foreachBatchBody(e, idCol, vecCol,
          annIndexDir, annMatchDir, k)(b, batchId)
      }
      b.write.format("vortex").mode("overwrite")
        .save(s"$corpusDir/epoch=$batchId")
    } finally b.unpersist()
  }
}
