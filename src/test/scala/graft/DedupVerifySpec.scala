package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.DedupOps

/** r16 optimization: minhashNearDupVerify's fast path (xxhash64 sorted
  * long arrays + primitive merge-count) must emit EXACTLY the rows of
  * the string array_intersect plan it replaced (kept as the collision
  * fallback). Cross-checks fast vs forceExact on real corpus slices,
  * including the degenerate empty-batch case, and pins docSetsDF ==
  * distinctSetsDF(tokens). */
class DedupVerifySpec extends AnyFunSuite {
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

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select("bid", "cid", "jac").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("fast verify == exact (string-intersect) verify, bit-identical jac") {
    val csets = DedupOps.distinctSetsDF(tok(col("doc_id") % 7 =!= 0))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val bsets = DedupOps.distinctSetsDF(tok(col("doc_id") % 7 === 0))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val cbands = DedupOps.setBands(spark, csets)
    val fast = DedupOps.minhashNearDupVerify(spark, csets, cbands, bsets, 0.5)
    val exact = DedupOps.minhashNearDupVerify(spark, csets, cbands, bsets, 0.5,
      forceExact = true)
    val (f, e) = (rows(fast), rows(exact))
    assert(f == e, s"fast=${f.size} exact=${e.size} diff=${(f diff e).take(3)} ${(e diff f).take(3)}")
    assert(f.nonEmpty, "slice must actually produce matches for the test to bite")
    fast.unpersist(); exact.unpersist()
    csets.unpersist(); bsets.unpersist()
  }

  test("empty batch side yields empty matches on both paths") {
    val csets = DedupOps.distinctSetsDF(tok(col("doc_id") % 7 =!= 0))
    val bsets = DedupOps.distinctSetsDF(tok(col("doc_id") < 0))
    val cbands = DedupOps.setBands(spark, csets)
    assert(rows(DedupOps.minhashNearDupVerify(spark, csets, cbands, bsets, 0.5)).isEmpty)
    assert(rows(DedupOps.minhashNearDupVerify(spark, csets, cbands, bsets, 0.5,
      forceExact = true)).isEmpty)
  }

  test("docSetsDF == distinctSetsDF(tokens) on both d_incremental slices") {
    for (pred <- Seq(col("doc_id") % 7 =!= 0, col("doc_id") % 7 === 0)) {
      val viaTok = DedupOps.distinctSetsDF(tok(pred))
        .select("sid", "toks", "members").collect()
        .map(r => (r.getLong(0), r.getSeq[String](1), r.getSeq[Long](2))).toSet
      val direct = DedupOps.docSetsForTest(spark, sfDir, pred)
        .select("sid", "toks", "members").collect()
        .map(r => (r.getLong(0), r.getSeq[String](1), r.getSeq[Long](2))).toSet
      assert(direct == viaTok)
      assert(direct.nonEmpty)
    }
  }
}
