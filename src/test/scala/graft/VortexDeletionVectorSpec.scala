package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.vortex.{DeletionVector, VortexDelete, VortexMaintenance}

/** Deletion-vector tier: point deletes write a row-mask sidecar
  * instead of rewriting the file; masked reads are row-equal to
  * rewritten reads; maintenance folds masks into real rewrites. */
class VortexDeletionVectorSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("vortex_dv").toString

  private def fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dvFiles(dir: String): Seq[String] = {
    def walk(p: Path): Seq[Path] =
      fs.listStatus(p).toSeq.flatMap(s => if (s.isDirectory) walk(s.getPath) else Seq(s.getPath))
    walk(new Path(dir)).map(_.getName).filter(DeletionVector.parseName(_).isDefined)
  }

  private def writeSample(dir: String, n: Long = 4000L, files: Int = 4): Unit = {
    import spark.implicits._
    (0L until n).map(i => (i, s"row$i", (i % 13).toInt)).toDF("id", "s", "m")
      .repartitionByRange(files, col("id")).sortWithinPartitions("id")
      .write.format("vortex").mode("overwrite").save(dir)
  }

  test("mask serialization round-trips and unions") {
    val a = DeletionVector.fromPositions(Array(0L, 5L, 63L, 64L, 100000L))
    val b = DeletionVector.fromBytes(DeletionVector.toBytes(a))
    assert(b.cardinality == 5L && b.positions.toSeq == Seq(0L, 5L, 63L, 64L, 100000L))
    assert(b.isDeleted(64L) && !b.isDeleted(65L) && !b.isDeleted(1L << 40))
    val u = DeletionVector.union(a, DeletionVector.fromPositions(Array(5L, 7L)))
    assert(u.cardinality == 6L && u.isDeleted(7L) && u.isDeleted(100000L))
  }

  test("masked reads are row-equal to rewritten reads") {
    val d1 = tmp(); val d2 = tmp()
    writeSample(d1); writeSample(d2)
    val pred = col("id") % 10L === 3L || col("m") === 7
    val r1 = VortexDelete.delete(spark, d1, pred, deletionVectors = true)
    val r2 = VortexDelete.delete(spark, d2, pred)
    assert(r1.rowsDeleted == r2.rowsDeleted && r1.rowsDeleted > 0L, s"$r1 vs $r2")
    assert(r1.maskedFiles > 0 && r1.rewrittenFiles == 0, r1)
    val a = spark.read.format("vortex").load(d1).orderBy("id").collect()
    val b = spark.read.format("vortex").load(d2).orderBy("id").collect()
    assert(a.toSeq == b.toSeq)
    // and the row-path projection (single column) agrees with columnar
    val ids = spark.read.format("vortex").load(d1).select("id")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().sorted
    assert(ids.toSeq == b.map(_.getLong(0)).toSeq)
  }

  test("point delete: sidecar is tiny, the data file is untouched") {
    val dir = tmp()
    writeSample(dir, 10000L, 1)
    val before = fs.listStatus(new Path(dir))
      .filter(_.getPath.getName.endsWith(".vortex"))
      .map(s => (s.getPath.getName, s.getLen, s.getModificationTime)).toSeq
    val res = VortexDelete.delete(spark, dir, col("id") === 4321L, deletionVectors = true)
    assert(res.rowsDeleted == 1L && res.maskedFiles == 1, res)
    val after = fs.listStatus(new Path(dir))
      .filter(_.getPath.getName.endsWith(".vortex"))
      .map(s => (s.getPath.getName, s.getLen, s.getModificationTime)).toSeq
    assert(after == before, "data file was touched by a point delete")
    val masks = dvFiles(dir)
    assert(masks.size == 1)
    val maskLen = fs.getFileStatus(new Path(new Path(dir),
      masks.head)).getLen
    assert(maskLen < 64L, s"point-delete sidecar is $maskLen bytes")
    assert(spark.read.format("vortex").load(dir).count() == 9999L)
    assert(spark.read.format("vortex").load(dir)
      .where(col("id") === 4321L).count() == 0L)
  }

  test("sequential deletes union: newest seq wins, older seqs cleaned") {
    val dir = tmp()
    writeSample(dir, 2000L, 1)
    VortexDelete.delete(spark, dir, col("id") < 100L, deletionVectors = true)
    VortexDelete.delete(spark, dir, col("id") >= 1900L, deletionVectors = true)
    val masks = dvFiles(dir)
    assert(masks.size == 1, s"stale mask seqs left: $masks")
    assert(DeletionVector.parseName(masks.head).get._2 == 2)
    val left = spark.read.format("vortex").load(dir)
    assert(left.count() == 1800L)
    assert(left.agg(sum("id")).head().getLong(0) == (100L until 1900L).sum)
    // re-running a delete is a no-op (masked rows are no longer live)
    val res = VortexDelete.delete(spark, dir, col("id") < 100L, deletionVectors = true)
    assert(res.rowsDeleted == 0L && res.maskedFiles == 0, res)
  }

  test("a file whose live rows all match drops whole, masks removed") {
    import spark.implicits._
    val dir = tmp()
    // exact file boundaries: file 0 = ids [0,1000), file 1 = [1000,2000)
    (0L until 1000L).map(i => (i, s"row$i", (i % 13).toInt)).toDF("id", "s", "m")
      .coalesce(1).write.format("vortex").mode("overwrite").save(dir)
    (1000L until 2000L).map(i => (i, s"row$i", (i % 13).toInt)).toDF("id", "s", "m")
      .coalesce(1).write.format("vortex").mode("append").save(dir)
    VortexDelete.delete(spark, dir, col("id") < 400L, deletionVectors = true)
    val res = VortexDelete.delete(spark, dir,
      col("id") >= 400L && col("id") < 1000L, deletionVectors = true)
    assert(res.droppedFiles == 1 && res.rowsDeleted == 600L, res)
    assert(dvFiles(dir).isEmpty, "masks of a dropped file must be removed")
    assert(spark.read.format("vortex").load(dir).count() == 1000L)
  }

  test("stats-answered aggregates and LIMIT stay correct over masked data") {
    val dir = tmp()
    writeSample(dir, 3000L, 2)
    VortexDelete.delete(spark, dir, col("id") >= 1000L && col("id") < 1500L,
      deletionVectors = true)
    val df = spark.read.format("vortex").load(dir)
    // COUNT/MIN/MAX/SUM would be answered from footer stats on an
    // unmasked dataset — the mask gate must fall back to the scan
    val agg = df.agg(count(lit(1)), min("id"), max("id"), sum("id")).head()
    assert(agg.getLong(0) == 2500L)
    assert(agg.getLong(1) == 0L && agg.getLong(2) == 2999L)
    assert(agg.getLong(3) == (0L until 3000L).filterNot(i => i >= 1000 && i < 1500).sum)
    assert(df.limit(1200).count() == 1200L) // trim accounting stays conservative
  }

  test("foldMasks rewrites the dead rows away; compact() folds first") {
    val dir = tmp()
    writeSample(dir, 4000L, 4)
    VortexDelete.delete(spark, dir, col("m") === 5, deletionVectors = true)
    val expect = (0L until 4000L).filterNot(_ % 13 == 5)
    val before = spark.read.format("vortex").load(dir).orderBy("id").collect()
    val fr = VortexMaintenance.foldMasks(spark, dir)
    assert(fr.foldedFiles == 4 && fr.rowsDropped == (4000L - expect.length), fr)
    assert(dvFiles(dir).isEmpty, "sidecars must be gone after fold")
    val after = spark.read.format("vortex").load(dir).orderBy("id").collect()
    assert(after.toSeq == before.toSeq)
    assert(after.length == expect.length)
    // folded files re-enter the manifest: stats-answered count again
    val entries = graft.sources.vortex.StatsManifest
      .read(new Path(dir), spark.sessionState.newHadoopConf())
    assert(entries.keys.exists(_.contains("part-fold-")), entries.keys.toSeq)

    // compact() folds masks before byte-copy (dead rows never resurrect)
    val dir2 = tmp()
    writeSample(dir2, 4000L, 4)
    VortexDelete.delete(spark, dir2, col("m") === 5, deletionVectors = true)
    VortexMaintenance.compact(spark, dir2, minFiles = 2)
    assert(dvFiles(dir2).isEmpty)
    val c = spark.read.format("vortex").load(dir2)
    assert(c.count() == expect.length.toLong)
    assert(c.where(col("m") === 5).count() == 0L)
    assert(c.agg(sum("id")).head().getLong(0) == expect.sum)
  }

  test("SQL DELETE FROM takes the mask tier under the session conf") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.vtx", "graft.sources.vortex.VortexCatalog")
    s2.conf.set("spark.graft.vortex.deletionVectors", "true")
    import s2.implicits._
    val dir = tmp()
    (0L until 1000L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1)
      .write.format("vortex").mode("overwrite").save(dir)
    s2.sql(s"DELETE FROM vtx.`$dir` WHERE id = 77")
    assert(dvFiles(dir).size == 1, "SQL delete did not write a mask sidecar")
    val left = s2.read.format("vortex").load(dir)
    assert(left.count() == 999L && left.where(col("id") === 77L).count() == 0L)
  }

  test("streaming over a DV-masked dataset serves live rows only (no resurrection)") {
    import spark.implicits._
    val src = tmp()
    val ckpt = java.nio.file.Files.createTempDirectory("vortex_dv_ckpt").toString
    (0L until 1000L).map(i => (i, i * 2)).toDF("id", "v").coalesce(1)
      .write.format("vortex").mode("overwrite").save(src)
    // DV delete BEFORE the stream reads the file: deleted rows must not
    // stream — this was the repo's one silent-wrong-data path (VERDICT
    // r10 #1: the micro-batch planner ignored .dv- sidecars)
    val res = VortexDelete.delete(spark, src, col("id") < 100L, deletionVectors = true)
    assert(res.maskedFiles == 1, res)
    def run(name: String): Unit = {
      val stream = spark.readStream.format("vortex").load(src)
        .groupBy().agg(count(lit(1)).as("n"), sum("id").as("s"))
      val q = stream.writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt).outputMode("complete").start()
      q.processAllAvailable(); q.stop()
    }
    run("dv_stream_out")
    assert(spark.table("dv_stream_out").head().toSeq ==
      Seq(900L, (100L until 1000L).sum))
    // a new file appended while the stream is down, then DV-deleted
    // before its batch streams: the batch must also read mask-aware
    (2000L until 2100L).map(i => (i, i)).toDF("id", "v").coalesce(1)
      .write.format("vortex").mode("append").save(src)
    VortexDelete.delete(spark, src, col("id") >= 2050L, deletionVectors = true)
    run("dv_stream_out2")
    assert(spark.table("dv_stream_out2").head().toSeq ==
      Seq(950L, (100L until 1000L).sum + (2000L until 2050L).sum))
  }

  test("streaming over a PARTITIONED (and DV-masked) dataset reconstructs partition columns") {
    import spark.implicits._
    val src = tmp()
    val ckpt = java.nio.file.Files.createTempDirectory("vortex_dvp_ckpt").toString
    (0L until 300L).map(i => (s"p${i % 3}", i)).toDF("p", "v")
      .write.format("vortex").option("partitionBy", "p")
      .mode("overwrite").save(src)
    // partition-scoped DV delete, then stream: the micro-batch planner
    // must carry path partition values (it used to throw the drift
    // guard on any partitioned dataset) AND apply the mask
    VortexDelete.delete(spark, src, col("p") === "p1" && col("v") < 150L,
      deletionVectors = true)
    val q = spark.readStream.format("vortex").load(src)
      .groupBy("p").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .writeStream.format("memory").queryName("dvp_stream_out")
      .option("checkpointLocation", ckpt).outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("dvp_stream_out").orderBy("p").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("p0", "p1", "p2"))
    assert(out.map(_.getLong(1)).toSeq == Seq(100L, 50L, 100L))
    assert(out(1).getLong(2) == (0L until 300L).filter(i => i % 3 == 1 && i >= 150L).sum)
  }

  test("partitioned layout: DV delete masks only inside the matching directory") {
    import spark.implicits._
    val dir = tmp()
    (0L until 300L).map(i => (s"p${i % 3}", i)).toDF("p", "v")
      .write.format("vortex").option("partitionBy", "p")
      .mode("overwrite").save(dir)
    val res = VortexDelete.delete(spark, dir,
      col("p") === "p1" && col("v") < 150L, deletionVectors = true)
    assert(res.maskedFiles >= 1 && res.rowsDeleted == 50L, res)
    assert(dvFiles(dir).nonEmpty)
    val left = spark.read.format("vortex").load(dir)
    assert(left.count() == 250L)
    assert(left.where(col("p") === "p1").count() == 50L)
    assert(left.where(col("p") === "p0").count() == 100L)
  }
}
