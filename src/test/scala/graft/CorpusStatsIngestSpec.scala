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
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName)
    assert(!names.exists(_.startsWith("seg=")), names.mkString(","))
    assert(names.count(_.startsWith("cseg=")) == 1)
    // ingest continues after compaction
    body(Seq("x q q").toDF("text"), 2L)
    assert(statsMap(dir) == reference(b1 ++ b2 ++ Seq("x q q")))
    // a SECOND compaction folds the base + the new segment
    CorpusStatsIngest.compact(spark, dir)
    assert(statsMap(dir) == reference(b1 ++ b2 ++ Seq("x q q")))
  }

  test("crash before the manifest commit leaves the old view intact") {
    import spark.implicits._
    val dir = tmp()
    val b1 = Seq("m n n", "m o")
    val b2 = Seq("n p")
    val body = CorpusStatsIngest.foreachBatchBody("text", dir)
    body(b1.toDF("text"), 0L)
    body(b2.toDF("text"), 1L)
    val before = statsMap(dir)
    // step 1 only: the new base is written but never committed —
    // readers must not see it (the crash window the old swap-dirs
    // protocol under-counted or zeroed in)
    val Some((snap, _)) = CorpusStatsIngest.writeBase(spark, dir)
    assert(statsMap(dir) == before)
    // recovery is just compacting again: generations only advance at
    // commit, so the re-fold overwrites the orphan base in place and
    // commits it — one base, correct stats
    CorpusStatsIngest.compact(spark, dir)
    assert(statsMap(dir) == before)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName)
    assert(names.count(_.startsWith("cseg=")) == 1)
    assert(names.contains(snap.base.get)) // the orphan name, now committed
    assert(!names.exists(_.startsWith("seg=")))
  }

  test("crash after the manifest commit but before cleanup never double-counts") {
    import spark.implicits._
    val dir = tmp()
    val b1 = Seq("u v v", "u w")
    val b2 = Seq("v x x")
    val body = CorpusStatsIngest.foreachBatchBody("text", dir)
    body(b1.toDF("text"), 0L)
    body(b2.toDF("text"), 1L)
    val before = statsMap(dir)
    // steps 1+2, crash before step 3: folded segment dirs still on
    // disk but tombstoned by the committed manifest
    val Some((snap, live)) = CorpusStatsIngest.writeBase(spark, dir)
    CorpusStatsIngest.commitManifest(spark, dir, snap)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    live.foreach(s => assert(fs.exists(new org.apache.hadoop.fs.Path(s))))
    assert(statsMap(dir) == before) // base + leftovers ≠ double count
    // a replayed batch that was already folded re-creates a tombstoned
    // segment name — still excluded, still no double count
    body(b2.toDF("text"), 1L)
    assert(statsMap(dir) == before)
    // next compaction (or any later one) finishes the cleanup
    CorpusStatsIngest.cleanup(spark, dir)
    assert(statsMap(dir) == before)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName)
    assert(!names.exists(_.startsWith("seg=")), names.mkString(","))
  }
}
