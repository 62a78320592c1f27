package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.vortex.{VortexDelete, VortexUpdate}

/** File-granularity UPDATE over vortex datasets: only files whose
  * stats admit a match are rewritten; SET expressions may reference
  * other columns; NULL predicates leave rows unchanged (SQL UPDATE
  * semantics); existing deletion-vector masks fold into the rewrite. */
class VortexUpdateSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("vortex_update").toString

  private def snapshot(dir: String): Map[String, (Long, Long)] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).toSeq.flatMap(s => if (s.isDirectory) walk(s.getPath) else Seq(s))
    walk(root).map(s => s.getPath.toString -> (s.getLen, s.getModificationTime)).toMap
  }

  test("range-clustered update touches only the files that can match") {
    import spark.implicits._
    val dir = tmp()
    (0L until 4000L).map(i => (i, i * 2, s"row$i")).toDF("id", "v", "s")
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
      .write.format("vortex").mode("overwrite").save(dir)
    val before = snapshot(dir)

    val res = VortexUpdate.update(spark, dir,
      Map("v" -> lit(-1L), "s" -> lit("redacted")),
      col("id") >= 1200L && col("id") < 1300L)
    assert(res.candidateFiles == 1 && res.rewrittenFiles == 1, res)
    assert(res.rowsUpdated == 100L)

    val after = spark.read.format("vortex").load(dir)
    assert(after.count() == 4000L) // UPDATE never changes cardinality
    assert(after.where(col("s") === "redacted").count() == 100L)
    assert(after.where(col("id") === 1250L).head().getLong(1) == -1L)
    assert(after.where(col("id") === 1250L).head().getString(2) == "redacted")
    // non-matching rows inside the rewritten file unchanged
    assert(after.where(col("id") === 1100L).head().getLong(1) == 2200L)
    // untouched files byte-identical
    snapshot(dir).foreach { case (p, st) =>
      if (p.endsWith(".vortex") && before.contains(p))
        assert(before(p) == st, s"file $p was touched")
    }
  }

  test("SET expressions reference other columns; NULL predicate rows unchanged") {
    import spark.implicits._
    val dir = tmp()
    (Seq.tabulate(100)(i => (i.toLong, Some(i.toLong), s"c${i % 3}")) ++
      Seq.tabulate(10)(i => (1000L + i, None: Option[Long], null: String)))
      .toDF("id", "v", "cat").coalesce(1)
      .write.format("vortex").mode("overwrite").save(dir)

    // WHERE cat = 'c1' is NULL for null cats → rows NOT updated
    val res = VortexUpdate.update(spark, dir,
      Map("v" -> (col("v") * 10L + col("id"))), col("cat") === "c1")
    assert(res.rowsUpdated == 33L, res)
    val after = spark.read.format("vortex").load(dir)
    assert(after.where(col("cat").isNull && col("v").isNotNull).count() == 0L)
    // v = v*10 + id where cat=c1 (ids 1,4,7,…)
    assert(after.where(col("id") === 4L).head().getLong(1) == 44L)
    assert(after.where(col("id") === 5L).head().getLong(1) == 5L) // c2: untouched
    // SET to NULL works (here onto already-null rows: cardinality pinned)
    val res2 = VortexUpdate.update(spark, dir, Map("cat" -> lit(null).cast("string")),
      col("id") >= 1000L)
    assert(res2.rowsUpdated == 10L, res2)
    assert(spark.read.format("vortex").load(dir)
      .where(col("cat").isNull).count() == 10L)
  }

  test("partitioned layout: partition predicate prunes to the matching directory") {
    import spark.implicits._
    val dir = tmp()
    (0L until 300L).map(i => (s"p${i % 3}", i, 1.0)).toDF("p", "v", "q")
      .write.format("vortex").option("partitionBy", "p")
      .mode("overwrite").save(dir)
    val before = snapshot(dir)
    val res = VortexUpdate.update(spark, dir, Map("q" -> lit(0.25)),
      col("p") === "p1" && col("v") < 150L)
    assert(res.rowsUpdated == 50L, res)
    val after = spark.read.format("vortex").load(dir)
    assert(after.where(col("q") === 0.25).count() == 50L)
    assert(after.where(col("p") === "p0" && col("q") =!= 1.0).count() == 0L)
    before.filter(_._1.contains("p=p0")).foreach { case (p, st) =>
      assert(snapshot(dir).get(p).contains(st), s"$p touched")
    }
  }

  test("update folds existing deletion-vector masks into the rewrite") {
    import spark.implicits._
    val dir = tmp()
    (0L until 1000L).map(i => (i, i * 2)).toDF("id", "v").coalesce(1)
      .write.format("vortex").mode("overwrite").save(dir)
    VortexDelete.delete(spark, dir, col("id") < 100L, deletionVectors = true)
    val res = VortexUpdate.update(spark, dir, Map("v" -> lit(0L)),
      col("id") >= 900L)
    assert(res.rowsUpdated == 100L, res)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new Path(dir)).map(_.getPath.getName)
    assert(!names.exists(_.contains(".dv-")), "masks must fold into the rewrite")
    val after = spark.read.format("vortex").load(dir)
    assert(after.count() == 900L) // deleted rows stay deleted
    assert(after.where(col("id") < 100L).count() == 0L)
    assert(after.where(col("v") === 0L).count() == 100L)
  }

  test("rewritten files re-enter the manifest with writer-exact sums") {
    import spark.implicits._
    val dir = tmp()
    (0L until 1000L).map(i => (i, i)).toDF("id", "v").coalesce(1)
      .write.format("vortex").mode("overwrite").save(dir)
    VortexUpdate.update(spark, dir, Map("v" -> lit(7L)), col("id") < 10L)
    val entries = graft.sources.vortex.StatsManifest
      .read(new Path(dir), spark.sessionState.newHadoopConf())
    val e = entries.keys.find(_.startsWith("part-update-"))
      .map(entries).getOrElse(fail(s"no update entry: ${entries.keys}"))
    assert(e.rows == 1000L)
    assert(e.cols.find(_.name == "v").get.sum.contains((10L until 1000L).sum + 70L))
    // and the stats-answered SUM agrees
    val got = spark.read.format("vortex").load(dir)
      .agg(sum("v")).head().getLong(0)
    assert(got == (10L until 1000L).sum + 70L)
  }

  test("deletion-vector update: point update masks + appends, data file untouched") {
    import spark.implicits._
    val dir = tmp()
    (0L until 4000L).map(i => (i, i * 2, s"row$i")).toDF("id", "v", "s")
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
      .write.format("vortex").mode("overwrite").save(dir)
    val before = snapshot(dir)
    val res = VortexUpdate.update(spark, dir,
      Map("v" -> lit(-5L), "s" -> lit("rescored")),
      col("id") >= 1200L && col("id") < 1210L, deletionVectors = true)
    assert(res.candidateFiles == 1 && res.maskedFiles == 1 &&
      res.rewrittenFiles == 0 && res.rowsUpdated == 10L, res)
    // original data files byte-identical; one tiny append + one sidecar
    snapshot(dir).foreach { case (p, st) =>
      if (before.contains(p)) assert(before(p) == st, s"file $p was touched")
    }
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new Path(dir)).map(_.getPath.getName)
    assert(names.count(_.startsWith("part-updv-")) == 1, names.toSeq)
    assert(names.count(_.contains(".dv-")) == 1, names.toSeq)
    val after = spark.read.format("vortex").load(dir)
    assert(after.count() == 4000L) // UPDATE never changes cardinality
    assert(after.where(col("s") === "rescored").count() == 10L)
    assert(after.where(col("id") === 1205L).select("v").head().getLong(0) == -5L)
    assert(after.where(col("id") === 1199L).select("v").head().getLong(0) == 2398L)
    assert(after.agg(sum("id")).head().getLong(0) == (0L until 4000L).sum)

    // foldMasks rewrites the masks away; results unchanged
    graft.sources.vortex.VortexMaintenance.foldMasks(spark, dir)
    val folded = spark.read.format("vortex").load(dir)
    assert(folded.count() == 4000L)
    assert(folded.where(col("s") === "rescored").count() == 10L)
    assert(folded.agg(sum("v")).head().getLong(0) ==
      (0L until 4000L).map(_ * 2).sum - (1200L until 1210L).map(_ * 2).sum - 50L)
    assert(!fs.listStatus(new Path(dir)).map(_.getPath.getName).exists(_.contains(".dv-")))
  }

  test("deletion-vector update composes with prior DV deletes (dead rows stay dead)") {
    import spark.implicits._
    val dir = tmp()
    (0L until 1000L).map(i => (i, i)).toDF("id", "v").coalesce(1)
      .write.format("vortex").mode("overwrite").save(dir)
    VortexDelete.delete(spark, dir, col("id") < 100L, deletionVectors = true)
    // predicate overlaps the deleted range: dead rows must NOT revive
    val res = VortexUpdate.update(spark, dir, Map("v" -> lit(0L)),
      col("id") < 200L, deletionVectors = true)
    assert(res.maskedFiles == 1 && res.rowsUpdated == 100L, res)
    val after = spark.read.format("vortex").load(dir)
    assert(after.count() == 900L)
    assert(after.where(col("id") < 100L).count() == 0L)
    assert(after.where(col("v") === 0L).count() == 100L) // ids 100..199
    assert(after.where(col("id") === 150L).select("v").head().getLong(0) == 0L)
    assert(after.where(col("id") === 250L).select("v").head().getLong(0) == 250L)
  }

  test("deletion-vector update: all-live-match degenerates to the rewrite tier") {
    import spark.implicits._
    val dir = tmp()
    (0L until 100L).map(i => (i, i)).toDF("id", "v").coalesce(1)
      .write.format("vortex").mode("overwrite").save(dir)
    val res = VortexUpdate.update(spark, dir, Map("v" -> lit(1L)),
      lit(true), deletionVectors = true)
    assert(res.rewrittenFiles == 1 && res.maskedFiles == 0, res)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new Path(dir)).map(_.getPath.getName)
    assert(!names.exists(_.contains(".dv-")), names.toSeq)
    assert(!names.exists(_.startsWith("part-updv-")), names.toSeq)
    assert(spark.read.format("vortex").load(dir)
      .agg(sum("v")).head().getLong(0) == 100L)
  }

  test("deletion-vector update: crash at every commit index, re-run converges") {
    import spark.implicits._
    val dir = tmp()
    (0L until 3000L).map(i => (i, i)).toDF("id", "v")
      .repartitionByRange(3, col("id")).sortWithinPartitions("id")
      .write.format("vortex").mode("overwrite").save(dir)
    // matches every 10th row — UNIFORM, so every file has matches no
    // matter where the (sample-seeded, per-execution) range boundaries
    // land; a range-local predicate made destructive-count flaky
    val predicate = col("id") % 10L === 0L
    // idempotent assignment (the documented re-run contract)
    val assigns = Map("v" -> lit(-9L))
    for (failAt <- 0 until 3) {
      val d2 = tmp()
      (0L until 3000L).map(i => (i, i)).toDF("id", "v")
        .repartitionByRange(3, col("id")).sortWithinPartitions("id")
        .write.format("vortex").mode("overwrite").save(d2)
      val crashed = intercept[Exception] {
        VortexUpdate.updateImpl(spark, d2, assigns, predicate,
          deletionVectors = true, failAfterCommits = failAt)
      }
      assert(crashed.getMessage.contains("injected crash"), crashed.getMessage)
      // re-run converges: every matching LIVE row updated exactly once
      VortexUpdate.update(spark, d2, assigns, predicate, deletionVectors = true)
      val after = spark.read.format("vortex").load(d2)
      assert(after.count() == 3000L, s"failAt=$failAt")
      assert(after.where(col("v") === -9L).count() == 300L, s"failAt=$failAt")
      assert(after.agg(sum("id")).head().getLong(0) == (0L until 3000L).sum,
        s"failAt=$failAt")
    }
  }

  test("SET on a partition column is rejected loudly (assignment would be dropped)") {
    import spark.implicits._
    val dir = tmp()
    (0L until 90L).map(i => (s"p${i % 3}", i, 1.0)).toDF("p", "v", "q")
      .write.format("vortex").option("partitionBy", "p")
      .mode("overwrite").save(dir)
    // partition columns live in the path, not the files: the rewrite
    // would compute the new value and then silently discard it
    val e = intercept[IllegalArgumentException] {
      VortexUpdate.update(spark, dir, Map("p" -> lit("p9")), col("v") < 10L)
    }
    assert(e.getMessage.contains("partition column"), e.getMessage)
    // dataset untouched
    val after = spark.read.format("vortex").load(dir)
    assert(after.where(col("p") === "p9").count() == 0L)
    assert(after.count() == 90L)
  }

  test("SET on a non-existent or nested column is rejected loudly") {
    import spark.implicits._
    val dir = tmp()
    (0L until 10L).map(i => (i, i)).toDF("id", "v").coalesce(1)
      .write.format("vortex").mode("overwrite").save(dir)
    val e = intercept[IllegalArgumentException] {
      VortexUpdate.update(spark, dir, Map("nope" -> lit(1)), col("id") < 5L)
    }
    assert(e.getMessage.contains("nope"))
    // non-deterministic SET rejected
    val e2 = intercept[IllegalArgumentException] {
      VortexUpdate.update(spark, dir, Map("v" -> rand()), col("id") < 5L)
    }
    assert(e2.getMessage.toLowerCase.contains("deterministic"))
  }
}
