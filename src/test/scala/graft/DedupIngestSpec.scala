package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.DedupIngest

/** Streaming stored-index dedup ingest: micro-batches probe the
  * standing corpus index, land idempotent match partitions, and
  * append their own signatures so LATER batches dedup against them —
  * with batch-replay idempotence on the index append.
  */
class DedupIngestSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("dedup_ingest").toString

  test("stream batches probe, append, and see earlier batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val e = Engine(spark)
    val indexDir = tmp() + "/index"
    val matchDir = tmp() + "/matches"

    // standing corpus: two documents
    e.buildDedupIndex(Seq(
        (1L, "alpha beta gamma delta epsilon"),
        (2L, "one two three four five six")).toDF("doc_id", "text"),
      "doc_id", "text", indexDir)

    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF.toDF("doc_id", "text").writeStream
      .foreachBatch(DedupIngest.foreachBatchBody(
        e, "doc_id", "text", indexDir, matchDir, tau = 0.8))
      .start()

    // batch 0: one near-dup of corpus doc 1, one brand-new doc
    ms.addData((10L, "alpha beta gamma delta epsilon"),
               (11L, "red orange yellow green blue"))
    q.processAllAvailable()
    // batch 1: a dup of batch 0's NEW doc — only findable if batch 0's
    // signatures were appended to the index
    ms.addData((20L, "red orange yellow green blue"))
    q.processAllAvailable(); q.stop()

    val matches = spark.read.option("basePath", matchDir).parquet(
        s"$matchDir/batch_id=*")
      .select("bid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(matches == Set((10L, 1L), (20L, 11L)), s"got $matches")

    // replaying a batch id must not re-append signatures
    val bands = s"$indexDir/bands"
    def bandFiles = new java.io.File(bands).listFiles().map(_.getName).toSet
    val before = bandFiles
    DedupIngest.foreachBatchBody(e, "doc_id", "text", indexDir, matchDir, 0.8)(
      Seq((20L, "red orange yellow green blue")).toDF("doc_id", "text"), 1L)
    assert(bandFiles == before, "replayed batch re-appended the index")
    // ...but its match partition was rewritten, not duplicated
    val m20 = spark.read.parquet(s"$matchDir/batch_id=1")
      .select("bid").collect().map(_.getLong(0)).toSeq
    assert(m20 == Seq(20L))
  }

  test("replay emits the original match set even for intra-batch near-dups") {
    import spark.implicits._
    val e = Engine(spark)
    val indexDir = tmp() + "/index"
    val matchDir = tmp() + "/matches"
    e.buildDedupIndex(Seq((1L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text"), "doc_id", "text", indexDir)
    // docs 30/31 duplicate EACH OTHER but nothing in the corpus: the
    // first run sees no corpus match; after the append their
    // signatures are in the index, so a naive replay probe would
    // surface (30,31)/(31,30) — the anti-join must keep the partition
    // identical to the first run
    val body = graft.streaming.DedupIngest.foreachBatchBody(
      e, "doc_id", "text", indexDir, matchDir, tau = 0.8)
    val batch = Seq((30L, "one two three four five"),
                    (31L, "one two three four five")).toDF("doc_id", "text")
    body(batch, 7L)
    val first = spark.read.parquet(s"$matchDir/batch_id=7")
      .select("bid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(first == Set.empty, s"first run got $first")
    body(batch, 7L) // replay
    val replay = spark.read.parquet(s"$matchDir/batch_id=7")
      .select("bid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(replay == first, s"replay diverged: $replay vs $first")
  }
}
