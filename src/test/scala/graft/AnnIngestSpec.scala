package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.AnnIngest

/** Streaming stored-IVF ANN ingest: micro-batches probe the standing
  * index for top-k neighbors, land idempotent match partitions, and
  * append their own vectors so LATER batches see them — with the
  * rank-slot replay guard (batch ids leave the candidate pool BEFORE
  * ranking) and batch-replay idempotence on the index append.
  */
class AnnIngestSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("ann_ingest").toString

  // 64-dim one-hot directions: orthogonal pairs score cos = 0, same
  // direction scores cos = 1 — assertions stay exact
  private def basis(i: Int): Seq[Float] =
    Seq.tabulate(64)(j => if (j == i) 1f else 0f)

  private def indexFiles(indexDir: String): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(indexDir))
      .map(_.getPath).filter(p => p.contains("k=") && !p.contains("_ingested"))
      .toSet
  }

  test("stream batches probe top-k, append, and see earlier batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val e = Engine(spark)
    val indexDir = tmp() + "/index"
    val matchDir = tmp() + "/matches"

    // standing corpus: two orthogonal vectors, one per cluster
    e.buildAnnIndex(Seq((1L, basis(0)), (2L, basis(1))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", indexDir, clusters = 2, refinements = 1)

    val ms = MemoryStream[(Long, Seq[Float])]
    val q = ms.toDF.toDF("vec_id", "embedding").writeStream
      .foreachBatch(AnnIngest.foreachBatchBody(
        e, "vec_id", "embedding", indexDir, matchDir, k = 2))
      .start()

    // batch 0: an exact copy of corpus vector 1, and a brand-new
    // direction nothing in the corpus matches
    ms.addData((10L, basis(0)), (11L, basis(2)))
    q.processAllAvailable()
    // batch 1: the same new direction as batch 0's doc 11 — a cos=1.0
    // rank-1 hit only if batch 0's vectors were appended to the index
    ms.addData((20L, basis(2)))
    q.processAllAvailable(); q.stop()

    val rows = spark.read.option("basePath", matchDir)
      .parquet(s"$matchDir/batch_id=*")
      .select("id_q", "rnk", "id_n", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val rank1 = rows.filter(_._2 == 1L).map(t => (t._1, t._3, t._4)).toSet
    assert(rank1.contains((10L, 1L, 1.0)), s"got $rank1")
    assert(rank1.contains((20L, 11L, 1.0)), s"got $rank1")
    // 11 saw only the standing corpus (both orthogonal to it)
    val r11 = rows.filter(t => t._1 == 11L).map(_._4).toSet
    assert(r11 == Set(0.0), s"got $r11")

    // replaying a batch id must not re-append vectors...
    val before = indexFiles(indexDir)
    AnnIngest.foreachBatchBody(e, "vec_id", "embedding", indexDir, matchDir, k = 2)(
      Seq((20L, basis(2))).toDF("vec_id", "embedding"), 1L)
    assert(indexFiles(indexDir) == before, "replayed batch re-appended the index")
    // ...and its rewritten match partition is identical even though
    // vector 20 itself now sits in the index: the pre-ranking exclude
    // keeps it out of the candidate pool, so 11 still ranks first
    val m20 = spark.read.parquet(s"$matchDir/batch_id=1")
      .select("id_q", "rnk", "id_n").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(m20.contains((20L, 1L, 11L)), s"got $m20")
    assert(!m20.exists(_._3 == 20L), s"own id consumed a slot: $m20")
  }

  test("replay emits the original ranks even for intra-batch twins") {
    import spark.implicits._
    val e = Engine(spark)
    val indexDir = tmp() + "/index"
    val matchDir = tmp() + "/matches"
    e.buildAnnIndex(Seq((1L, basis(0)), (2L, basis(1))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", indexDir, clusters = 2, refinements = 1)
    // 30/31 duplicate EACH OTHER but nothing in the corpus: after the
    // append both sit in the index with cos=1.0 of each other — a
    // post-ranking filter would emit a different top-k on replay
    val body = AnnIngest.foreachBatchBody(
      e, "vec_id", "embedding", indexDir, matchDir, k = 1)
    val batch = Seq((30L, basis(3)), (31L, basis(3))).toDF("vec_id", "embedding")
    body(batch, 7L)
    def part() = spark.read.parquet(s"$matchDir/batch_id=7")
      .select("id_q", "rnk", "id_n", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val first = part()
    assert(first.forall(_._4 == 0.0), s"first run saw a twin: $first")
    body(batch, 7L) // replay
    assert(part() == first, s"replay diverged: ${part()} vs $first")
  }
}
