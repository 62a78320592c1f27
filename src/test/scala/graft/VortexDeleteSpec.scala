package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.vortex.VortexDelete

/** File-granularity DELETE over vortex datasets: only files whose
  * stats admit a match are touched; untouched files (data AND their
  * manifest entries) stay byte-identical; all-match files drop without
  * a rewrite; SQL DELETE routes through SupportsDelete. */
class VortexDeleteSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.catalog.vtx", "graft.sources.vortex.VortexCatalog")
    .getOrCreate()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("vortex_delete").toString

  /** (name → (len, mtime)) for every file under dir, recursive */
  private def snapshot(dir: String): Map[String, (Long, Long)] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).toSeq.flatMap(s => if (s.isDirectory) walk(s.getPath) else Seq(s))
    walk(root).map(s => s.getPath.toString ->
      (s.getLen, s.getModificationTime)).toMap
  }

  private def manifestBytes(dir: String): Map[String, Seq[Byte]] = {
    val md = new Path(dir, "_manifests")
    val fs = md.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(md)) Map.empty
    else fs.listStatus(md).toSeq.map { st =>
      val in = fs.open(st.getPath)
      val b = try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in) finally in.close()
      st.getPath.getName -> b.toSeq
    }.toMap
  }

  test("range-clustered delete touches only the files that can match") {
    import spark.implicits._
    val dir = tmp()
    // 4 files, range-clustered on id so manifest min/max localize any
    // id predicate to one file
    (0L until 4000L).map(i => (i, s"row$i")).toDF("id", "s")
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
      .write.format("vortex").mode("overwrite").save(dir)
    val before = snapshot(dir)
    val beforeManifests = manifestBytes(dir)
    assert(before.keys.count(_.endsWith(".vortex")) == 4)

    val res = VortexDelete.delete(spark, dir, col("id") >= 1200L && col("id") < 1300L)
    // stats pruning: only the file holding [1000,2000) is a candidate
    assert(res.candidateFiles == 1, res)
    assert(res.rewrittenFiles == 1 && res.droppedFiles == 0)
    assert(res.rowsDeleted == 100L)

    // survivors exact
    val left = spark.read.format("vortex").load(dir)
    assert(left.count() == 3900L)
    assert(left.where(col("id") >= 1200L && col("id") < 1300L).count() == 0L)
    assert(left.agg(sum("id")).head().getLong(0) ==
      (0L until 4000L).filterNot(i => i >= 1200 && i < 1300).sum)

    // untouched data files byte-identical (same path, len, mtime)
    val after = snapshot(dir)
    val untouchedBefore = before.filter { case (p, _) => after.contains(p) }
    untouchedBefore.foreach { case (p, st) =>
      if (p.endsWith(".vortex")) assert(after(p) == st, s"file $p was touched")
    }
    // every pre-existing manifest file byte-identical; delete only ADDS
    val afterManifests = manifestBytes(dir)
    beforeManifests.foreach { case (n, b) =>
      assert(afterManifests.get(n).contains(b), s"manifest $n changed")
    }
    assert(afterManifests.size == beforeManifests.size + 1)
  }

  test("all-match files drop whole; null predicate rows survive") {
    import spark.implicits._
    val dir = tmp()
    // file 0: category a (all match), file 1: category b + nulls
    Seq.tabulate(100)(i => ("a", i.toLong)).toDF("cat", "v").coalesce(1)
      .write.format("vortex").mode("overwrite").save(dir)
    (Seq.tabulate(100)(i => (Some("b"), i.toLong)) ++
      Seq.tabulate(10)(i => (None: Option[String], 1000L + i)))
      .toDF("cat", "v").coalesce(1)
      .write.format("vortex").mode("append").save(dir)
    assert(spark.read.format("vortex").load(dir).count() == 210L)

    val res = VortexDelete.delete(spark, dir, col("cat") === "a")
    assert(res.droppedFiles == 1 && res.rewrittenFiles == 0, res)
    assert(res.rowsDeleted == 100L)
    val left = spark.read.format("vortex").load(dir)
    assert(left.count() == 110L)

    // WHERE cat != 'b' is NULL for null cats → those rows SURVIVE
    val res2 = VortexDelete.delete(spark, dir, col("cat") =!= "b")
    assert(res2.rowsDeleted == 0L)
    // and deleting b leaves exactly the null rows
    val res3 = VortexDelete.delete(spark, dir, col("cat") === "b")
    assert(res3.rowsDeleted == 100L)
    val nulls = spark.read.format("vortex").load(dir)
    assert(nulls.count() == 10L && nulls.where(col("cat").isNull).count() == 10L)
  }

  test("partitioned layout: partition predicate prunes to the matching directory") {
    import spark.implicits._
    val dir = tmp()
    (0L until 300L).map(i => (s"p${i % 3}", i)).toDF("p", "v")
      .write.format("vortex").option("partitionBy", "p")
      .mode("overwrite").save(dir)
    val before = snapshot(dir)
    val res = VortexDelete.delete(spark, dir, col("p") === "p1")
    // only p=p1's files were candidates, and all their rows match
    assert(res.candidateFiles == res.droppedFiles && res.rewrittenFiles == 0, res)
    assert(res.rowsDeleted == 100L)
    val left = spark.read.format("vortex").load(dir)
    assert(left.count() == 200L && left.where(col("p") === "p1").count() == 0L)
    before.filter(_._1.contains("p=p0")).foreach { case (p, st) =>
      assert(snapshot(dir).get(p).contains(st), s"$p touched")
    }
  }

  test("SQL DELETE FROM via the catalog (SupportsDelete)") {
    import spark.implicits._
    val dir = tmp()
    (0L until 1000L).map(i => (i, (i % 7).toInt)).toDF("id", "m")
      .repartition(2).write.format("vortex").mode("overwrite").save(dir)
    spark.sql(s"DELETE FROM vtx.`$dir` WHERE m = 3 OR id < 10")
    val left = spark.read.format("vortex").load(dir)
    val expect = (0L until 1000L).count(i => !(i % 7 == 3 || i < 10))
    assert(left.count() == expect.toLong)
    assert(left.where(col("m") === 3 || col("id") < 10).count() == 0L)
  }

  test("delete on a bucketed layout preserves the bucket dirs and the marker") {
    import spark.implicits._
    val dir = tmp()
    (0L until 2000L).map(i => (i, s"v$i")).toDF("id", "s")
      .write.format("vortex").option("bucketBy", "id").option("buckets", "4")
      .mode("overwrite").save(dir)
    val hconf = spark.sessionState.newHadoopConf()
    val spec0 = graft.sources.vortex.BucketSpecFile.read(new Path(dir), hconf)
    assert(spec0.contains(("id", 4)))
    val res = VortexDelete.delete(spark, dir, col("id") % 10L === 3L)
    assert(res.rowsDeleted == 200L && res.rewrittenFiles > 0)
    // marker intact; every replacement file still under its __bucket dir
    assert(graft.sources.vortex.BucketSpecFile.read(new Path(dir), hconf) == spec0)
    val fs = new Path(dir).getFileSystem(hconf)
    graft.sources.vortex.PartitionedLayout
      .listWithPartitions(new Path(dir), hconf).foreach { case (st, parts) =>
        assert(parts.exists(_._1 == "__bucket"), s"${st.getPath} outside bucket layout")
      }
    val left = spark.read.format("vortex").load(dir)
    assert(left.count() == 1800L && left.where(col("id") % 10L === 3L).count() == 0L)
    // bucket routing still consistent: each surviving row reads back
    // from the dir its key hashes to (spot-check via a keyed filter)
    assert(left.where(col("id") === 4L).count() == 1L)
  }

  test("delete composes with compaction: fold the rewritten survivors, stats stay exact") {
    import spark.implicits._
    val dir = tmp()
    (0L until 3000L).map(i => (i, i * 3)).toDF("id", "v")
      .repartitionByRange(3, col("id")).sortWithinPartitions("id")
      .write.format("vortex").mode("overwrite").save(dir)
    val res = VortexDelete.delete(spark, dir, col("id") % 2L === 0L)
    assert(res.rowsDeleted == 1500L)
    val cr = graft.sources.vortex.VortexMaintenance.compact(spark, dir, minFiles = 2)
    assert(cr.filesAbsorbed >= 2, cr.toString)
    val left = spark.read.format("vortex").load(dir)
    assert(left.count() == 1500L)
    assert(left.agg(sum("id")).head().getLong(0) ==
      (0L until 3000L).filter(_ % 2 == 1).sum)
    assert(left.where(col("id") % 2L === 0L).count() == 0L)
  }

  test("crash mid-commit: re-running the same DELETE converges (no dup, no loss)") {
    import spark.implicits._
    // 4 range-clustered files, every one holds matches → 4 rewrites
    val expect = (0L until 4000L).filterNot(_ % 10 == 3)
    for (failAt <- Seq(0, 1, 2, 3)) {
      val dir = tmp()
      (0L until 4000L).map(i => (i, s"row$i")).toDF("id", "s")
        .repartitionByRange(4, col("id")).sortWithinPartitions("id")
        .write.format("vortex").mode("overwrite").save(dir)
      val crashed = intercept[Exception] {
        VortexDelete.deleteImpl(spark, dir, col("id") % 10L === 3L, failAfterCommits = failAt)
      }
      assert(crashed.getMessage.contains("injected crash"), crashed.getMessage)
      // re-run the SAME delete, no seam: must converge to the exact
      // survivor set — already-committed files untouched, the
      // interrupted file's stale replacement overwritten, the rest done
      val res = VortexDelete.delete(spark, dir, col("id") % 10L === 3L)
      assert(res.rowsDeleted <= 400L, res) // never re-deletes committed work
      val left = spark.read.format("vortex").load(dir)
      assert(left.count() == expect.length.toLong, s"failAt=$failAt")
      assert(left.agg(sum("id")).head().getLong(0) == expect.sum, s"failAt=$failAt")
      assert(left.where(col("id") % 10L === 3L).count() == 0L)
      // and a third run is a no-op
      val res2 = VortexDelete.delete(spark, dir, col("id") % 10L === 3L)
      assert(res2.rowsDeleted == 0L && res2.rewrittenFiles == 0 && res2.droppedFiles == 0)
    }
  }

  test("crash between rename-in and source delete: re-run removes the dup window") {
    import spark.implicits._
    val dir = tmp()
    (0L until 1000L).map(i => (i, i * 2)).toDF("id", "v").coalesce(1)
      .write.format("vortex").mode("overwrite").save(dir)
    val hconf = spark.sessionState.newHadoopConf()
    val fs = new Path(dir).getFileSystem(hconf)
    val src = fs.listStatus(new Path(dir))
      .map(_.getPath).find(_.getName.endsWith(".vortex")).get
    // simulate the narrowest crash window by hand: the replacement is
    // renamed in but the source delete was lost — the dataset briefly
    // holds every survivor twice
    val dstName = VortexDelete.replacementName(src.getName)
    val survivors = spark.read.format("vortex").load(dir).where(col("id") >= 100L)
    survivors.coalesce(1).write.format("vortex")
      .mode("overwrite").save(dir + "_stage")
    val staged = fs.listStatus(new Path(dir + "_stage"))
      .map(_.getPath).find(_.getName.endsWith(".vortex")).get
    fs.rename(staged, new Path(new Path(dir), dstName))
    // the consistent read view resolves the pair to its BEFORE state
    assert(spark.read.format("vortex").load(dir).count() == 1000L)
    // re-running the delete converges: src still matches → rewritten to
    // the SAME deterministic name (stale replacement overwritten), src
    // deleted
    val res = VortexDelete.delete(spark, dir, col("id") < 100L)
    assert(res.rowsDeleted == 100L, res)
    val left = spark.read.format("vortex").load(dir)
    assert(left.count() == 900L)
    assert(left.agg(sum("id")).head().getLong(0) == (100L until 1000L).sum)
  }

  test("crash-window pair + a DIFFERENT statement: stale replacement repaired, no dup") {
    import spark.implicits._
    val dir = tmp()
    (0L until 1000L).map(i => (i, i * 2)).toDF("id", "v").coalesce(1)
      .write.format("vortex").mode("overwrite").save(dir)
    val hconf = spark.sessionState.newHadoopConf()
    val fs = new Path(dir).getFileSystem(hconf)
    val src = fs.listStatus(new Path(dir))
      .map(_.getPath).find(_.getName.endsWith(".vortex")).get
    // stage the narrowest crash window (replacement renamed in, source
    // delete lost) for a delete of id < 100
    val dstName = VortexDelete.replacementName(src.getName)
    spark.read.format("vortex").load(dir).where(col("id") >= 100L)
      .coalesce(1).write.format("vortex").mode("overwrite").save(dir + "_st")
    val staged = fs.listStatus(new Path(dir + "_st"))
      .map(_.getPath).find(_.getName.endsWith(".vortex")).get
    fs.rename(staged, new Path(new Path(dir), dstName))
    // consistent read view: before state, no dup
    assert(spark.read.format("vortex").load(dir).count() == 1000L)
    // now a DIFFERENT delete runs: the stale replacement must be
    // repaired away first, or survivors outside both predicates would
    // commit twice
    val res = VortexDelete.delete(spark, dir, col("id") >= 900L)
    assert(res.rowsDeleted == 100L, res)
    val left = spark.read.format("vortex").load(dir)
    assert(left.count() == 900L) // ids 0..899 exactly once
    assert(left.agg(sum("id")).head().getLong(0) == (0L until 900L).sum)
    // note: the repaired state resurrects id<100 (the crashed statement
    // FAILED; its contract is re-run-to-converge) — prove they're back
    assert(left.where(col("id") < 100L).count() == 100L)
  }

  test("RuntimeReplaceable predicates (BETWEEN/nvl) evaluate correctly") {
    import spark.implicits._
    val dir = tmp()
    (0L until 1000L).map(i => (i, if (i % 10 == 0) None else Some(i * 2)))
      .toDF("id", "v").coalesce(1)
      .write.format("vortex").mode("overwrite").save(dir)
    // BETWEEN is RuntimeReplaceable (replacement = With/CommonExpressionRef
    // in Spark 4): interpreted eval asserts unless rewritten first
    val res = VortexDelete.delete(spark, dir,
      col("id").between(100L, 199L) && expr("nvl(v, 0) >= 0"))
    assert(res.rowsDeleted == 100L, res)
    val left = spark.read.format("vortex").load(dir)
    assert(left.count() == 900L)
    assert(left.where(col("id").between(100L, 199L)).count() == 0L)
    // update path too (predicate AND a RuntimeReplaceable SET expression)
    graft.sources.vortex.VortexUpdate.update(spark, dir,
      Map("v" -> expr("nvl(v, -1)")), col("id").between(200L, 209L))
    val after = spark.read.format("vortex").load(dir)
    assert(after.where(col("id") === 200L).head().getLong(1) == -1L) // was null
    assert(after.where(col("id") === 201L).head().getLong(1) == 402L)
  }

  test("DELETE/UPDATE over an emptied dataset are no-ops, not errors") {
    import spark.implicits._
    val dir = tmp()
    (0L until 100L).map(i => (i, i)).toDF("id", "v").coalesce(1)
      .write.format("vortex").mode("overwrite").save(dir)
    val r1 = VortexDelete.delete(spark, dir, lit(true))
    assert(r1.droppedFiles == 1 && r1.rowsDeleted == 100L, r1)
    val r2 = VortexDelete.delete(spark, dir, col("id") < 10L)
    assert(r2 == VortexDelete.DeleteResult(0, 0, 0, 0, 0L))
    val r3 = graft.sources.vortex.VortexUpdate.update(spark, dir,
      Map("v" -> lit(0L)), col("id") < 10L)
    assert(r3.rewrittenFiles == 0 && r3.rowsUpdated == 0L, r3)
  }

  test("rewritten files re-enter the manifest with sums and inherited bloom opt-ins") {
    import spark.implicits._
    val dir = tmp()
    (0L until 1000L).map(i => (i, i * 2)).toDF("id", "v").coalesce(1)
      .write.format("vortex").option("bloomFilters", "id")
      .mode("overwrite").save(dir)
    val res = VortexDelete.delete(spark, dir, col("id") < 100L)
    assert(res.rewrittenFiles == 1 && res.rowsDeleted == 100L)
    val hconf = spark.sessionState.newHadoopConf()
    val entries = graft.sources.vortex.StatsManifest.read(new Path(dir), hconf)
    val fs = new Path(dir).getFileSystem(hconf)
    val live = fs.listStatus(new Path(dir))
      .filter(_.getPath.getName.endsWith(".vortex")).map(_.getPath.getName)
    assert(live.length == 1 && live.head.startsWith("part-delete-"))
    val e = entries(live.head)
    assert(e.rows == 900L)
    val idCol = e.cols.find(_.name == "id").get
    assert(idCol.bloom.isDefined, "bloom opt-in not inherited")
    assert(idCol.sum.contains((100L until 1000L).sum))
    val vCol = e.cols.find(_.name == "v").get
    assert(vCol.sum.contains((100L until 1000L).map(_ * 2).sum))
  }
}
