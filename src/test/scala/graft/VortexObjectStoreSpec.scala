package graft

import java.net.URI
import java.nio.file.Files
import org.apache.hadoop.fs.{DelegateToFileSystem, RawLocalFileSystem}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** S5 (object-store reads): every vortex path flows through the Hadoop
  * FileSystem abstraction, so a non-`file:` scheme must work end to
  * end — list, glob, footer reads, chunk reads, writes. This registers
  * a custom `mockfs://` scheme (backed by the local FS, resolved via
  * Hadoop's ServiceLoader-free conf keys, exactly how s3a is wired in
  * production) and runs the round trip through it.
  */
class VortexObjectStoreSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    // getOrCreate may reuse another suite's session, dropping builder
    // confs — register the scheme on the live Hadoop conf instead
    s.sparkContext.hadoopConfiguration.set("fs.mockfs.impl", classOf[MockFs].getName)
    s
  }

  test("vortex write + glob read + pushdown over a non-file FS scheme") {
    import org.apache.spark.sql.functions._
    val local = Files.createTempDirectory("vortex_mockfs_").toString
    val dir = s"mockfs://host$local/data"
    spark.range(0, 5000).selectExpr("id", "CAST(id % 7 AS LONG) AS g")
      .write.format("vortex").mode("append").save(dir)
    val back = spark.read.format("vortex").load(dir)
    assert(back.count() == 5000)
    assert(back.filter(col("id") >= 2500).count() == 2500)
    // glob over the scheme
    val globbed = spark.read.format("vortex").load(s"mockfs://host$local/data/*.vortex")
    assert(globbed.count() == 5000)
    // partitioned layout over the scheme
    val pdir = s"mockfs://host$local/part"
    spark.range(0, 100).selectExpr("id", "CAST(id % 4 AS LONG) AS k")
      .write.format("vortex").option("partitionBy", "k").mode("append").save(pdir)
    val part = spark.read.format("vortex").load(pdir)
    assert(part.filter(col("k") === 2).count() == 25)
  }

  test("object-store contract points: in-progress invisibility, manifest commit, bucket layout") {
    import org.apache.spark.sql.functions._
    val local = Files.createTempDirectory("vortex_mockfs2_").toString
    val dir = s"mockfs://host$local/t"
    spark.range(0, 10000).selectExpr("id", "id * 2 AS v")
      .repartitionByRange(4, org.apache.spark.sql.functions.col("id"))
      .write.format("vortex").mode("overwrite").save(dir)
    // a crashed task's .inprogress remnant must never be observable
    val orphan = new java.io.File(s"$local/t/.part-99999-dead-0.vortex.inprogress")
    java.nio.file.Files.writeString(orphan.toPath, "garbage")
    val back = spark.read.format("vortex").load(dir)
    assert(back.count() == 10000)
    // manifest-tier file pruning works through the scheme (ranged write
    // above → disjoint id ranges per file)
    assert(back.filter(col("id") < 2000).count() == 2000)
    assert(new java.io.File(s"$local/t/_manifests").listFiles.nonEmpty)
    // bucketed layout + bucket-pruned point read over the scheme
    val bdir = s"mockfs://host$local/b"
    spark.range(0, 1000).selectExpr("id", "id % 50 AS key")
      .write.format("vortex").option("bucketBy", "key").option("buckets", "8")
      .mode("overwrite").save(bdir)
    val b = spark.read.format("vortex").load(bdir)
    assert(b.filter(col("key") === 7).count() == 20)
  }
}

/** `mockfs://` — RawLocalFileSystem under a different authority-bearing
  * scheme; mirrors how object stores plug into Hadoop. */
class MockFs extends RawLocalFileSystem {
  private var uri: URI = _
  override def initialize(name: URI, conf: org.apache.hadoop.conf.Configuration): Unit = {
    super.initialize(name, conf)
    uri = URI.create(name.getScheme + "://" + Option(name.getAuthority).getOrElse("host"))
  }
  // called from the super constructor before initialize() → fallback
  override def getUri: URI = if (uri == null) URI.create("mockfs:///") else uri
  override def getScheme: String = "mockfs"
  // strip scheme/authority → delegate to the local path
  override def pathToFile(path: org.apache.hadoop.fs.Path): java.io.File =
    new java.io.File(path.toUri.getPath)
}
