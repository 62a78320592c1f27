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
