package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming maintenance of the inverted-index corpus statistics
  * (token → document frequency, corpus frequency) — the stats that
  * feed BM25 df/idf and the unigram-LM quality score
  * (`r_inverted_df` / `t_unigram_nll` are the batch twins).
  *
  * The stats are a MERGEABLE aggregate, so the index is
  * log-structured: each micro-batch writes one segment
  * (`seg=<batchId>`, a (tok, df, cf) parquet) and readers merge
  * segments with a vocab-sized `GROUP BY`. Consequences:
  *  - per-batch work is O(batch) — the standing corpus is never
  *    re-read, re-tokenized, or rewritten on ingest;
  *  - batch replay is idempotent BY CONSTRUCTION: a segment is keyed
  *    by its batch id and written with overwrite, so a replayed batch
  *    replaces its own segment byte-for-byte equivalently — no marker
  *    protocol needed (contrast DedupIngest, whose append-only
  *    signature files DO need one);
  *  - reads pay one small merge per query; `compact()` folds all
  *    current segments into a single base segment (write-new,
  *    swap-dirs) when the segment count grows — the Lucene trade.
  *
  * At 100 TB: segments are vocab-bounded regardless of batch size,
  * the merge is vocab-bounded regardless of corpus size, and
  * compaction cost is segments × vocab — none of it scales with the
  * token stream.
  */
object CorpusStatsIngest {

  /** per-doc local counting (one map per document, vocab-bounded
    * output per doc) → per-batch (tok, df, cf) stats */
  def batchStats(batch: DataFrame, textCol: String): DataFrame = {
    val s = batch.sparkSession
    import s.implicits._
    batch.select(col(textCol).cast("string")).as[String]
      .flatMap { text =>
        val counts = new java.util.HashMap[String, Long]()
        text.split(" ", -1).foreach(t => counts.merge(t, 1L, (a, b) => a + b))
        scala.jdk.CollectionConverters.IteratorHasAsScala(counts.entrySet().iterator())
          .asScala.map(e => (e.getKey, e.getValue))
      }
      .toDF("tok", "tf")
      .groupBy("tok")
      .agg(count(lit(1)).as("df"), sum("tf").as("cf"))
  }

  /** The `(batch, batchId) => Unit` body for
    * `docs.writeStream.foreachBatch(...)`. */
  def foreachBatchBody(textCol: String, indexDir: String)
      : (DataFrame, Long) => Unit = (batch, batchId) => {
    batchStats(batch, textCol)
      .coalesce(1) // vocab-sized
      .write.mode("overwrite")
      .parquet(s"$indexDir/seg=$batchId")
  }

  /** merged standing stats: one vocab-sized GROUP BY over segments */
  def readStats(spark: SparkSession, indexDir: String): DataFrame = {
    val segs = segments(spark, indexDir)
    if (segs.isEmpty) {
      import spark.implicits._
      Seq.empty[(String, Long, Long)].toDF("tok", "df", "cf")
    } else
      spark.read.parquet(segs: _*)
        .groupBy("tok")
        .agg(sum("df").as("df"), sum("cf").as("cf"))
  }

  private def segments(spark: SparkSession, indexDir: String): Seq[String] = {
    val p = new Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("seg="))
      .map(_.getPath.toString)
  }

  /** Fold every current segment into a single base segment. Write-new
    * then swap: the merged stats land in a temp dir first, so a crash
    * mid-compaction leaves either the old segments or the complete
    * new base — never a partial merge. (The swap itself — N deletes +
    * one rename — is not atomic against a CONCURRENT reader listing
    * mid-swap; run compaction in the ingest's own foreachBatch thread,
    * where Structured Streaming serializes it against ingest, or
    * behind the caller's own lock.) */
  def compact(spark: SparkSession, indexDir: String): Unit = {
    val segs = segments(spark, indexDir)
    if (segs.size <= 1) return
    val tmp = s"$indexDir/_compact_tmp"
    readStats(spark, indexDir).coalesce(1).write.mode("overwrite").parquet(tmp)
    val fs = new Path(indexDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    segs.foreach(s => fs.delete(new Path(s), true))
    fs.rename(new Path(tmp), new Path(s"$indexDir/seg=base"))
  }
}
