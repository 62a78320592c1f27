package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{DedupOps, SimilarityOps}

/** Incremental APPEND for the stored indexes (round-5 verdict item 7):
  * a daily ingest must update the corpus-signature index and the IVF
  * index by hashing/assigning ONLY the new batch — never re-reading,
  * re-hashing, or rewriting the standing corpus's files — and probes
  * over the appended index must equal a from-scratch rebuild. */
class IndexAppendSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private def tok(pred: org.apache.spark.sql.Column) =
    Tables.t(spark, sfDir, "documents").filter(pred)
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))

  /** (relative path → length) of every DATA file under dir — the
    * manifest is metadata and MAY be rewritten by an append; the
    * corpus's .vortex files must not be. */
  private def dataFiles(dir: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir)).filter(_.getName.endsWith(".vortex"))
      .map(f => f.getAbsolutePath.stripPrefix(dir) -> f.length).toMap
  }

  test("corpus-index append hashes only the batch and leaves standing files untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_append").toString
    val corpusA = tok(col("doc_id") % 7 =!= 0 && col("doc_id") < 250)
    val corpusB = tok(col("doc_id") % 7 =!= 0 && col("doc_id") >= 250)
    val batch = tok(col("doc_id") % 7 === 0)

    DedupOps.buildCorpusIndex(spark, corpusA, dir)
    val before = dataFiles(dir)
    assert(before.nonEmpty)

    DedupOps.appendCorpusIndex(spark, corpusB, dir)
    val after = dataFiles(dir)
    // standing files byte-identical (same path, same length), new ones added
    before.foreach { case (p, len) =>
      assert(after.get(p).contains(len), s"standing index file $p was rewritten")
    }
    assert(after.size > before.size, "append must add new index files")

    // probe over the appended index == bipartite dedup over the FULL corpus
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("bid"), col("cid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val csets = spark.read.format("vortex").load(s"$dir/sets")
    val cbands = spark.read.format("vortex").load(s"$dir/bands")
    val gotIdx = DedupOps.minhashNearDupAgainstIndex(spark, csets, cbands, batch, 0.5)
    val got = pairs(gotIdx)
    gotIdx.unpersist(false)
    val expect = pairs(DedupOps.minhashNearDupAgainst(
      spark, tok(col("doc_id") % 7 =!= 0), batch, 0.5))
    assert(got == expect,
      s"appended-index probe diverges: extra=${got -- expect} missing=${expect -- got}")
  }

  test("IVF-index append assigns new vectors to stored centroids without re-clustering") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_append").toString
    def vecs(pred: org.apache.spark.sql.Column) = {
      import graft.functions.VecFixedPoint
      Tables.t(spark, sfDir, "embeddings").filter(pred)
        .select(col("vec_id"), col("label"), col("embedding"))
        .as[(Long, Int, Seq[Float])]
        .map { case (id, lb, e) =>
          val q = VecFixedPoint.quantize(e)
          SimilarityOps.QVec(id, lb, q, VecFixedPoint.dot(q, q))
        }
    }
    val n = Tables.t(spark, sfDir, "embeddings").count()
    val cut = n / 2
    SimilarityOps.buildIvfIndex(spark, vecs(col("vec_id") < cut), dir, K = 4, refinements = 2)
    val before = dataFiles(dir)
    val centsBefore = SimilarityOps.readCentroids(spark, dir)

    SimilarityOps.appendIvfIndex(spark, vecs(col("vec_id") >= cut), dir)
    val after = dataFiles(dir)
    before.foreach { case (p, len) =>
      assert(after.get(p).contains(len), s"standing index file $p was rewritten")
    }
    assert(after.size > before.size, "append must add new index files")
    // centroids unchanged — append must NOT re-cluster
    val centsAfter = SimilarityOps.readCentroids(spark, dir)
    assert(centsBefore.map(_.toSeq).toSeq == centsAfter.map(_.toSeq).toSeq)

    // every row (old and new) sits in the partition of its nearest
    // stored centroid, and nothing was lost
    val idx = spark.read.format("vortex").load(dir)
      .select(col("id"), col("k"), col("q")).as[(Long, Long, Seq[Long])].collect()
    assert(idx.length == n)
    idx.foreach { case (id, k, q) =>
      assert(k == graft.functions.VecFixedPoint.nearestCentroid(q.toArray, centsAfter),
        s"vector $id in cluster $k, nearest stored centroid is " +
          s"${graft.functions.VecFixedPoint.nearestCentroid(q.toArray, centsAfter)}")
    }
  }
}
