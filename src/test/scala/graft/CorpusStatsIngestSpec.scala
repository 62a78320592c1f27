package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.CorpusStatsIngest

/** Streaming corpus-statistics ingest: segment-per-batch df/cf index,
  * replay-idempotent by construction, compaction-preserving. */
class CorpusStatsIngestSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("corpus_stats").toString

  private def statsMap(dir: String): Map[String, (Long, Long)] =
    CorpusStatsIngest.readStats(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def reference(docs: Seq[String]): Map[String, (Long, Long)] = {
    val m = scala.collection.mutable.Map.empty[String, (Long, Long)]
    docs.foreach { text =>
      text.split(" ", -1).groupBy(identity).foreach { case (t, xs) =>
        val (df, cf) = m.getOrElse(t, (0L, 0L))
        m(t) = (df + 1, cf + xs.length)
      }
    }
    m.toMap
  }

  test("streamed batches accumulate to the exact batch recompute") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dir = tmp()
    val b1 = Seq("a b b c", "a a d")
    val b2 = Seq("b e", "a c c c")
    val ms = MemoryStream[String]
    val q = ms.toDF.toDF("text").writeStream
      .foreachBatch(CorpusStatsIngest.foreachBatchBody("text", dir))
      .start()
    ms.addData(b1: _*); q.processAllAvailable()
    assert(statsMap(dir) == reference(b1))
    ms.addData(b2: _*); q.processAllAvailable()
    assert(statsMap(dir) == reference(b1 ++ b2))
    q.stop()
  }

  test("replaying a batch id is idempotent; compaction preserves the stats") {
    import spark.implicits._
    val dir = tmp()
    val b1 = Seq("x y y", "x z")
    val b2 = Seq("y q", "z z z")
    val body = CorpusStatsIngest.foreachBatchBody("text", dir)
    body(b1.toDF("text"), 0L)
    body(b2.toDF("text"), 1L)
    val before = statsMap(dir)
    assert(before == reference(b1 ++ b2))
    // replay batch 1 (Structured Streaming re-delivers after restart):
    // its segment is overwritten in place, nothing double-counts
    body(b2.toDF("text"), 1L)
    assert(statsMap(dir) == before)
    // compaction folds segments into one base; stats identical
    CorpusStatsIngest.compact(spark, dir)
    assert(statsMap(dir) == before)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val segs = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.getPath.getName.startsWith("seg="))
    assert(segs.length == 1 && segs.head.getPath.getName == "seg=base")
    // ingest continues after compaction
    body(Seq("x q q").toDF("text"), 2L)
    assert(statsMap(dir) == reference(b1 ++ b2 ++ Seq("x q q")))
  }
}
