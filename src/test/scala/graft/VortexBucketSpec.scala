package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.sources.{EqualTo, GreaterThan, In, Or}
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.vortex.{BucketSpecFile, VortexInputPartition, VortexScanBuilder}

/** Hash-bucketed layout (`bucketBy`/`buckets` write options): rows land
  * in `__bucket=k` directories with k = pmod(murmur3_32(key, 42), n) —
  * identical to Spark's `pmod(hash(col), n)` — giving (a) 1/n file I/O
  * on key-equality lookups via bucket pruning and (b) write-side
  * co-location: `requiredNumPartitions = n` aligns shuffle partitions
  * with buckets so each task writes exactly one bucket file.
  */
class VortexBucketSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private def writeBucketed(dir: String, n: Int, mode: String = "overwrite"): Unit =
    spark.range(0, 5000).selectExpr("id AS k", "id * 3 AS v")
      .write.format("vortex")
      .option("bucketBy", "k").option("buckets", n.toString)
      .mode(mode).save(dir)

  test("bucketed write: layout dirs, marker file, one file per bucket") {
    val dir = Files.createTempDirectory("vortex_bucket_").toString
    writeBucketed(dir, 8)
    val root = new java.io.File(dir)
    val bucketDirs = root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("__bucket="))
    assert(bucketDirs.map(_.getName).sorted.sameElements((0 until 8).map(k => s"__bucket=$k").sorted))
    assert(new java.io.File(root, "_vortex_bucket.json").exists())
    // write distribution aligned shuffle partitions with buckets:
    // exactly one data file per bucket directory
    bucketDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".vortex"))
      assert(files.length == 1, s"${d.getName}: expected 1 file, got ${files.length}")
    }
  }

  test("round-trip: __bucket hidden from schema, data intact, hash placement correct") {
    val dir = Files.createTempDirectory("vortex_bucket_").toString
    writeBucketed(dir, 8)
    val back = spark.read.format("vortex").load(dir)
    assert(back.schema.fieldNames.sorted.sameElements(Array("k", "v")))
    assert(back.count() == 5000)
    assert(back.selectExpr("sum(k)").head.getLong(0) == (0L until 5000).sum)
    // every row of one bucket dir hashes to that bucket under Spark's own hash()
    val b3 = spark.read.format("vortex").load(s"$dir/__bucket=3")
    assert(b3.count() > 0)
    assert(b3.selectExpr("pmod(hash(k), 8) AS b").where("b <> 3").count() == 0)
  }

  test("bucket pruning: equality filter plans only the matching bucket's files") {
    val dir = Files.createTempDirectory("vortex_bucket_").toString
    writeBucketed(dir, 8)
    val schema = spark.read.format("vortex").load(dir).schema
    def planned(filters: Array[org.apache.spark.sql.sources.Filter]): Seq[String] = {
      val sb = new VortexScanBuilder(schema, Seq(dir))
      sb.pushFilters(filters)
      sb.build().asInstanceOf[org.apache.spark.sql.connector.read.Batch]
        .planInputPartitions().map(_.asInstanceOf[VortexInputPartition].file).toSeq
    }
    val all = planned(Array.empty)
    assert(all.size == 8)
    val expected = BucketSpecFile.bucketOf(123L, LongType, 8)
    val eq = planned(Array(EqualTo("k", 123L)))
    assert(eq.nonEmpty && eq.forall(_.contains(s"__bucket=$expected")))
    // IN prunes to the union of literal buckets; OR with a non-key
    // predicate constrains nothing
    val in = planned(Array(In("k", Array(1L, 2L, 3L))))
    val inBuckets = Set(1L, 2L, 3L).map(BucketSpecFile.bucketOf(_, LongType, 8))
    assert(in.nonEmpty && in.forall(f => inBuckets.exists(b => f.contains(s"__bucket=$b"))))
    // OR with a non-key disjunct constrains no buckets (v > -1 is
    // also un-prunable by chunk stats, isolating the bucket tier)
    assert(planned(Array(Or(EqualTo("k", 1L), GreaterThan("v", -1L)))).size == 8)
    // end-to-end correctness with pruning active
    assert(spark.read.format("vortex").load(dir).where("k = 123").selectExpr("v").head.getLong(0) == 369)
  }

  test("append: no options inherits the marker spec; explicit mismatch fails fast") {
    val dir = Files.createTempDirectory("vortex_bucket_").toString
    writeBucketed(dir, 8)
    val ex = intercept[Exception] {
      spark.range(0, 10).selectExpr("id AS k", "id AS v")
        .write.format("vortex")
        .option("bucketBy", "k").option("buckets", "4")
        .mode("append").save(dir)
    }
    assert(ex.getMessage.contains("bucketed by"))
    // optionless append inherits bucketing: rows land in bucket dirs,
    // never loose at the root
    spark.range(5000, 5010).selectExpr("id AS k", "id * 3 AS v")
      .write.format("vortex").mode("append").save(dir)
    val root = new java.io.File(dir)
    assert(!root.listFiles().exists(f => f.isFile && f.getName.endsWith(".vortex")))
    assert(spark.read.format("vortex").load(dir).count() == 5010)
    writeBucketed(dir, 8, mode = "append")
    assert(spark.read.format("vortex").load(dir).count() == 10010)
  }
}
