package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{BoundedBucketPairs, MaxAccumulator}
import graft.queries.DedupOps

/** The LSH-banded kernels must bound every task even on pathological
  * template corpora (one bucket holding a large fraction of the
  * corpus), without changing the pair set: BoundedBucketPairs splits
  * oversized buckets into block-pair tasks — an EXACT reformulation,
  * not an approximation.
  */
class BoundedBucketPairsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("oversized bucket: identical pair set, every task group within bound") {
    import spark.implicits._
    val hot = 600; val cap = 64; val blocks = 8
    // one hot bucket of 600 items + two small buckets of 10 and 3
    val rows =
      (0 until hot).map(i => (0, "hot", i.toLong)) ++
      (0 until 10).map(i => (1, "s1", (1000 + i).toLong)) ++
      (0 until 3).map(i => (2, "s2", (2000 + i).toLong))
    val ds = spark.createDataset(rows)
    val gauge = new MaxAccumulator
    spark.sparkContext.register(gauge, "maxBucketGroup")
    val got = BoundedBucketPairs.pairs[Long, (Long, Long)](
      ds, cap, blocks,
      blockOf = _.toInt,
      emit = (_, a, b) => Iterator.single((math.min(a, b), math.max(a, b))),
      gauge = Some(gauge))
      .collect().toSet
    val expected = (for {
      (band, bk, _) <- Seq((0, "hot", hot), (1, "s1", 10), (2, "s2", 3))
      ids = rows.collect { case (b, k, id) if b == band && k == bk => id }
      i <- ids.indices; j <- i + 1 until ids.length
    } yield (math.min(ids(i), ids(j)), math.max(ids(i), ids(j)))).toSet
    assert(got == expected)
    assert(got.size == hot * (hot - 1) / 2 + 45 + 3)
    // hot bucket: block-pair groups hold ≤ 2·⌈600/8⌉ = 150 items; the
    // small path holds ≤ cap. The gauge saw every group.
    assert(gauge.value > 0)
    assert(gauge.value <= math.max(cap, 2 * ((hot + blocks - 1) / blocks)))
  }

  test("minhashCandidates: forcing every bucket through the block path is a no-op") {
    import spark.implicits._
    // near-identical docs sharing band signatures + some distinct ones
    val docs = (0L until 30L).map(i => (i, s"alpha beta gamma delta epsilon zeta u$i")) ++
      (30L until 40L).map(i => (i, s"x$i y$i z$i"))
    val tok = docs.toDF("doc_id", "text")
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))
    def run(cap: Int, blocks: Int): Set[(Long, Long)] =
      DedupOps.minhashCandidates(spark, tok, cap, blocks)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val normal = run(4096, 16)
    val forced = run(1, 4) // every multi-item bucket is "oversized"
    assert(normal == forced)
    assert(normal.nonEmpty)
  }

  test("cosineNearDupPairs: block-forced run matches the direct run") {
    val sf = "/root/testdata/sf0.001"
    def run(cap: Int): Set[(Long, Long, Double)] =
      graft.queries.SimilarityOps.cosineNearDupPairs(spark, sf, cap, blocks = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run(Int.MaxValue) == run(1))
  }
}
