package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{CorpusStatsIngest, DedupIngest, IngestPipeline}

/** End-to-end composed ingest: ONE micro-batch stream (the vortex
  * streaming source over a landing directory) fans each batch into the
  * standing corpus (vortex, epoch-keyed), the dedup index + match log,
  * the corpus-stats index, AND the ANN index + neighbor log — and a
  * batch replay leaves all four byte-consistent. The pieces are
  * individually spec-proven elsewhere; this drives the composition a
  * real ingest runs. */
class IngestPipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("ingest_pipeline").toString

  // 64-dim one-hot directions: orthogonal pairs score cos = 0, same
  // direction scores cos = 1 — assertions stay exact
  private def basis(i: Int): Seq[Float] =
    Seq.tabulate(64)(j => if (j == i) 1f else 0f)

  test("vortex source -> corpus + dedup + stats + ann, consistent per batch and under replay") {
    import spark.implicits._
    val e = Engine(spark)
    val root = tmp()
    val landing = s"$root/landing"   // upstream drops vortex files here
    val corpus = s"$root/corpus"
    val indexDir = s"$root/dedup_index"
    val matchDir = s"$root/matches"
    val statsDir = s"$root/stats"
    val annIndexDir = s"$root/ann_index"
    val annMatchDir = s"$root/ann_matches"
    val ckpt = s"$root/ckpt"
    val ann = Some(("embedding", annIndexDir, annMatchDir, 2))

    // standing corpus before the stream starts: one seed doc
    val seed = Seq((1L, "alpha beta gamma delta epsilon", basis(0)))
      .toDF("doc_id", "text", "embedding")
    e.buildDedupIndex(seed, "doc_id", "text", indexDir)
    e.buildAnnIndex(seed, "doc_id", "embedding", annIndexDir,
      clusters = 1, refinements = 1)
    CorpusStatsIngest.foreachBatchBody("text", statsDir)(seed, -1L)
    seed.write.format("vortex").mode("overwrite").save(s"$corpus/epoch=-1")

    // wave 1 lands BEFORE the stream starts (schema inference needs a file)
    val wave1 = Seq(
      (10L, "alpha beta gamma delta epsilon", basis(0)),  // near-dup of seed 1
      (11L, "red orange yellow green blue", basis(2)))    // brand new
    wave1.toDF("doc_id", "text", "embedding")
      .write.format("vortex").mode("append").save(landing)

    val q = spark.readStream.format("vortex").load(landing)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(IngestPipeline.foreachBatchBody(
        e, "doc_id", "text", corpus, indexDir, matchDir, statsDir, tau = 0.8, ann))
      .start()
    q.processAllAvailable()

    // wave 2: a dup of wave 1's NEW doc (text AND direction) — found
    // only if batch 0's signatures/vectors were appended before batch 1
    // probed
    val wave2 = Seq((20L, "red orange yellow green blue", basis(2)))
    wave2.toDF("doc_id", "text", "embedding")
      .write.format("vortex").mode("append").save(landing)
    q.processAllAvailable(); q.stop()

    def matchSet = spark.read.option("basePath", matchDir)
      .parquet(s"$matchDir/batch_id=*")
      .select("bid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(matchSet == Set((10L, 1L), (20L, 11L)), s"got $matchSet")

    // ANN log: doc 10 sees seed 1 at cos 1.0; doc 20 sees doc 11 at
    // cos 1.0 (proof batch 0's vectors appended before batch 1 probed)
    def annRank1 = spark.read.option("basePath", annMatchDir)
      .parquet(s"$annMatchDir/batch_id=*")
      .where(col("rnk") === 1L)
      .select("id_q", "id_n", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(annRank1.contains((10L, 1L, 1.0)), s"got $annRank1")
    assert(annRank1.contains((20L, 11L, 1.0)), s"got $annRank1")

    // corpus holds every ingested doc, epoch-keyed
    def corpusRows = spark.read.format("vortex").load(corpus)
      .select(col("doc_id").cast("long"), col("epoch").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(corpusRows == Set((1L, -1L), (10L, 0L), (11L, 0L), (20L, 1L)))

    // stats equal the batch recompute over ALL landed docs
    val allTexts = Seq("alpha beta gamma delta epsilon") ++
      wave1.map(_._2) ++ wave2.map(_._2)
    def statsMap = CorpusStatsIngest.readStats(spark, statsDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expect = {
      val m = scala.collection.mutable.Map.empty[String, (Long, Long)]
      allTexts.foreach(_.split(" ", -1).groupBy(identity).foreach { case (t, xs) =>
        val (df, cf) = m.getOrElse(t, (0L, 0L)); m(t) = (df + 1, cf + xs.length)
      })
      m.toMap
    }
    assert(statsMap == expect)

    // REPLAY batch 1 (Structured Streaming redelivery contract: same
    // id, same data): every consumer lands its own batch-keyed output
    // again — matches, ann log, corpus, and stats all unchanged
    def files(dir: String, excl: String): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir)).map(_.getPath).filterNot(_.contains(excl)).toSet
    }
    val bandsBefore = files(s"$indexDir/bands", "_ingested")
    val annBefore = files(annIndexDir, "_ingested")
    IngestPipeline.foreachBatchBody(
      e, "doc_id", "text", corpus, indexDir, matchDir, statsDir, tau = 0.8, ann)(
      wave2.toDF("doc_id", "text", "embedding"), 1L)
    assert(matchSet == Set((10L, 1L), (20L, 11L)))
    assert(annRank1.contains((20L, 11L, 1.0)), s"got $annRank1")
    assert(!annRank1.exists(t => t._1 == 20L && t._2 == 20L),
      "replay let doc 20's own indexed vector consume its slot")
    assert(corpusRows == Set((1L, -1L), (10L, 0L), (11L, 0L), (20L, 1L)))
    assert(statsMap == expect)
    assert(files(s"$indexDir/bands", "_ingested") == bandsBefore,
      "replay re-appended the dedup index")
    assert(files(annIndexDir, "_ingested") == annBefore,
      "replay re-appended the ann index")
  }
}
