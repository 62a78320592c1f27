package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.vortex.VortexFileReader

/** The stored IVF index (SimilarityOps.dsIvfIndex + v_cos_ivf_stored):
  * the index is a vortex dataset partitioned by cluster, so a probe of
  * cluster k must decode ONLY k's directory — the property that makes
  * the stored index the 100 TB shape (probe cost ∝ cluster size, not
  * corpus size). Also pins build-once semantics and incremental dedup's
  * bipartite contract. */
class IvfIndexSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("probing one cluster decodes only that cluster's pages") {
    val dir = graft.queries.SimilarityOps.dsIvfIndex.ensure(spark, sfDir)
    val idx = spark.read.format("vortex").load(dir)
    val clusters = idx.groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.size > 1, s"need >1 cluster to prove pruning, got $clusters")
    val (probeK, probeRows) = clusters.minBy(_._2)
    // pages decoded for the single-cluster probe must cover probe-k
    // rows only; a full-corpus scan decodes strictly more
    // sum(id * 2) defeats the stats-aggregate pushdown on both sides
    // (expression sums are never metadata-answered), so page-decode
    // counts measure real data reads
    val d0 = VortexFileReader.pageDecodes.get()
    val got = spark.read.format("vortex").load(dir)
      .filter(col("k") === probeK)
      .agg(count(lit(1)).as("n"), sum(col("id") * 2)).collect()(0).getLong(0)
    val probeDecodes = VortexFileReader.pageDecodes.get() - d0
    assert(got == probeRows)
    val d1 = VortexFileReader.pageDecodes.get()
    spark.read.format("vortex").load(dir).agg(sum(col("id") * 2)).collect()
    val fullDecodes = VortexFileReader.pageDecodes.get() - d1
    assert(probeDecodes < fullDecodes,
      s"probe must decode fewer pages than a full scan ($probeDecodes vs $fullDecodes)")
  }

  test("the index builds once: a second ensure() is a no-op") {
    val dir = graft.queries.SimilarityOps.dsIvfIndex.ensure(spark, sfDir)
    val marker = new java.io.File(dir, "_graft_ready")
    val mtime = marker.lastModified
    val again = graft.queries.SimilarityOps.dsIvfIndex.ensure(spark, sfDir)
    assert(again == dir && marker.lastModified == mtime,
      "second ensure must not rebuild the index")
  }

  test("incremental dedup finds exactly the batch→corpus edges of the self-join") {
    import graft.queries.DedupOps
    val docs = Tables.t(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val tok = docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("w"))
    val batchTok = tok.filter(col("doc_id") % 7 === 0)
    val corpusTok = tok.filter(col("doc_id") % 7 =!= 0)
    val got = DedupOps.minhashNearDupAgainst(spark, corpusTok, batchTok, 0.5)
      .select(col("bid"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: the full self-join's verified pairs, restricted to
    // (batch, corpus) pairs — the bipartite path must find the same
    // set (both sides band with identical parameters)
    val all = DedupOps.minhashNearDup(spark, tok, 0.5)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = all.flatMap { case (a, b) =>
      Seq((a, b), (b, a)).collect {
        case (x, y) if x % 7 == 0 && y % 7 != 0 => (x, y)
      }
    }.toSet
    assert(got == expect,
      s"bipartite pairs diverge: extra=${got -- expect} missing=${expect -- got}")
  }
}
