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

  test("s3-semantics store: copy-rename commit, GETs scale with commits not files") {
    import org.apache.spark.sql.functions._
    spark.sparkContext.hadoopConfiguration.set("fs.s3mock.impl", classOf[S3SemanticsFs].getName)
    val local = Files.createTempDirectory("vortex_s3sem_").toString
    val dir = s"s3mock://bucket$local/t"

    // -- write commit: one PUT per in-progress file (+1 manifest), one
    //    COPY (non-atomic copy+delete rename) per committed data file
    S3SemanticsFs.reset()
    spark.range(0, 40000).selectExpr("id", "id * 2 AS v")
      .repartitionByRange(4, col("id"))
      .write.format("vortex").mode("overwrite").save(dir)
    val afterWrite = S3SemanticsFs.snapshot
    val nFiles = new java.io.File(s"$local/t").listFiles.count(_.getName.endsWith(".vortex"))
    assert(nFiles == 4)
    assert(afterWrite("COPY") == nFiles.toLong,
      s"expected one copy-rename per data file, got $afterWrite")
    // correctness through the non-atomic commit
    assert(spark.read.format("vortex").load(dir).count() == 40000)

    // -- cold planning: GETs are proportional to COMMITS (one manifest
    //    JSON read), never to files — no footer GET for covered files
    graft.sources.vortex.VortexFileReader.clearFooterCache()
    spark.catalog.clearCache()
    S3SemanticsFs.reset()
    val df = spark.read.format("vortex").load(dir)
    val parts = df.filter(col("id") < 10000).rdd.getNumPartitions
    assert(parts >= 1)
    val plan = S3SemanticsFs.snapshot
    assert(plan("GET") <= 2,
      s"planning a manifest-covered dataset must read ~1 manifest, no footers: $plan")

    // -- execution: data GETs hit the surviving file ONLY — the 3
    //    range-pruned files are never opened (each action re-reads the
    //    manifest, so total GETs stay O(commits + surviving files))
    S3SemanticsFs.reset()
    assert(df.filter(col("id") < 10000).count() == 10000)
    val exec = S3SemanticsFs.snapshot
    val prunedOpened = S3SemanticsFs.opened.toArray.map(_.toString)
      .filter(p => p.endsWith(".vortex") && {
        // files are range-written on id; the surviving one holds id<10000
        val survives = spark.read.format("vortex")
          .load(s"s3mock://bucket$p").filter(col("id") < 10000).count() > 0
        !survives
      })
    assert(prunedOpened.isEmpty,
      s"range-pruned files must never be opened, but saw: ${prunedOpened.toSeq}; ops $exec")
    assert(exec("GET") <= 6, s"execution GETs should stay O(commits + surviving): $exec")
  }

  test("s3-semantics store: absent-key bloom lookup costs one manifest GET, zero data opens") {
    import org.apache.spark.sql.functions._
    spark.sparkContext.hadoopConfiguration.set("fs.s3mock.impl", classOf[S3SemanticsFs].getName)
    val local = Files.createTempDirectory("vortex_s3bloom_").toString
    val dir = s"s3mock://bucket$local/t"
    // random ids: every file spans the whole domain, ranges can't prune
    spark.range(0, 40000).selectExpr("xxhash64(id) AS key", "id AS v")
      .repartition(4)
      .write.format("vortex").option("bloomFilters", "key")
      .mode("overwrite").save(dir)

    graft.sources.vortex.VortexFileReader.clearFooterCache()
    S3SemanticsFs.reset()
    val n = spark.read.format("vortex").load(dir)
      .filter(col("key") === 123456789L).count()
    assert(n == 0)
    val ops = S3SemanticsFs.snapshot
    // the 100 TB point-lookup contract: ONE manifest read decides the
    // whole query; no footer, no page, no data-file GET at all
    assert(ops("GET") <= 2, s"bloom lookup must cost ~1 manifest GET: $ops")
    val dataOpened = S3SemanticsFs.opened.toArray.map(_.toString)
      .filter(_.endsWith(".vortex"))
    assert(dataOpened.isEmpty,
      s"bloom-pruned files must never be opened, but saw: ${dataOpened.toSeq}")
  }
}

/** `s3mock://` — object-store SEMANTICS, not just a renamed scheme:
  * rename is a byte-copy + delete (S3 has no rename), and every
  * metadata/data operation is counted (LIST / HEAD / GET / PUT /
  * COPY) so the I/O-contract claims in OBJECT_STORES.md are EXECUTED:
  * manifest-covered planning costs GETs proportional to commits, not
  * files; chunk reads are ranged GETs against surviving files only;
  * the write commit issues one copy per data file and stays correct
  * without an atomic rename. */
object S3SemanticsFs {
  import java.util.concurrent.atomic.AtomicLong
  val lists = new AtomicLong
  val heads = new AtomicLong
  val gets = new AtomicLong
  val puts = new AtomicLong
  val copies = new AtomicLong
  val opened = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def reset(): Unit = { Seq(lists, heads, gets, puts, copies).foreach(_.set(0)); opened.clear() }
  def snapshot: Map[String, Long] = Map(
    "LIST" -> lists.get, "HEAD" -> heads.get, "GET" -> gets.get,
    "PUT" -> puts.get, "COPY" -> copies.get)
}

class S3SemanticsFs extends RawLocalFileSystem {
  import org.apache.hadoop.fs.{Path => HPath}
  private var uri: URI = _
  override def initialize(name: URI, conf: org.apache.hadoop.conf.Configuration): Unit = {
    super.initialize(name, conf)
    uri = URI.create(name.getScheme + "://" + Option(name.getAuthority).getOrElse("bucket"))
  }
  override def getUri: URI = if (uri == null) URI.create("s3mock:///") else uri
  override def getScheme: String = "s3mock"
  override def pathToFile(path: HPath): java.io.File =
    new java.io.File(path.toUri.getPath)
  override def listStatus(f: HPath): Array[org.apache.hadoop.fs.FileStatus] = {
    S3SemanticsFs.lists.incrementAndGet(); super.listStatus(f)
  }
  override def getFileStatus(f: HPath): org.apache.hadoop.fs.FileStatus = {
    S3SemanticsFs.heads.incrementAndGet(); super.getFileStatus(f)
  }
  override def open(f: HPath, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream = {
    S3SemanticsFs.gets.incrementAndGet()
    S3SemanticsFs.opened.add(f.toUri.getPath)
    super.open(f, bufferSize)
  }
  override def create(f: HPath, permission: org.apache.hadoop.fs.permission.FsPermission,
                      overwrite: Boolean, bufferSize: Int, replication: Short,
                      blockSize: Long,
                      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    S3SemanticsFs.puts.incrementAndGet()
    super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress)
  }
  /** S3 rename = server-side COPY + DELETE: NOT atomic, O(bytes).
    * Exercises that the task-commit protocol only needs
    * write-then-publish, never in-place mutation. */
  override def rename(src: HPath, dst: HPath): Boolean = {
    S3SemanticsFs.copies.incrementAndGet()
    val s = pathToFile(src); val d = pathToFile(dst)
    if (!s.exists) return false
    d.getParentFile.mkdirs()
    java.nio.file.Files.copy(s.toPath, d.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    s.delete()
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
