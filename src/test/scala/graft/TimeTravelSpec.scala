package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.vortex.{VortexCommitLog, VortexDelete, VortexMaintenance, VortexUpdate}

/** Manifest-pinned snapshot generations (VERDICT r11 "What's missing"
  * #2 / next-round order #3): maintenance statements publish numbered
  * commit-log generations; with `spark.graft.vortex.timeTravel=true`
  * superseded files RETIRE instead of deleting, so `versionAsOf` reads
  * are statement-level snapshots — including the headline case: a
  * reader pinned to gen N mid-multi-file-DELETE sees the complete
  * BEFORE state across every file (the default listing read is only
  * per-file before-or-after). */
class TimeTravelSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("vortex_tt").toString

  private def fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def withTimeTravel[T](body: => T): T = {
    spark.conf.set(VortexCommitLog.ConfKey, "true")
    try body finally spark.conf.unset(VortexCommitLog.ConfKey)
  }

  private def stage(dir: String, files: Int = 4, rows: Long = 2000L): Unit = {
    import spark.implicits._
    (0L until rows).map(i => (i, i % 10, s"v$i")).toDF("k", "m", "v")
      .repartition(files).write.format("vortex").mode("overwrite").save(dir)
  }

  private def readV(dir: String, gen: Int) =
    spark.read.format("vortex").option("versionAsOf", gen).load(dir)

  test("generations chain across DELETE and UPDATE; every pinned read is exact") {
    withTimeTravel {
      val dir = tmp(); stage(dir)
      VortexDelete.delete(spark, dir, col("m") === 0)          // gen 0 (genesis) + gen 1
      VortexUpdate.update(spark, dir, Map("v" -> lit("X")), col("m") === 1) // gen 2
      assert(VortexCommitLog.latestGen(fs, new Path(dir)).contains(2))
      // gen 0: the original dataset, byte-exact
      assert(readV(dir, 0).count() == 2000L)
      assert(readV(dir, 0).filter(col("m") === 0).count() == 200L)
      assert(readV(dir, 0).filter(col("v") === "X").count() == 0L)
      // gen 1: after the delete, before the update
      assert(readV(dir, 1).count() == 1800L)
      assert(readV(dir, 1).filter(col("v") === "X").count() == 0L)
      // gen 2 == the live read
      assert(readV(dir, 2).filter(col("v") === "X").count() == 200L)
      assert(spark.read.format("vortex").load(dir).count() == 1800L)
      // aggregate equality against the pinned past
      val sum0 = readV(dir, 0).agg(sum("k")).head.getLong(0)
      assert(sum0 == (0L until 2000L).sum)
    }
  }

  test("mid-multi-file-DELETE: a pinned reader sees the complete BEFORE generation") {
    withTimeTravel {
      val dir = tmp(); stage(dir, files = 4)
      // crash after 2 of 4 per-file commits — the live dataset is now
      // a cross-file MIX of before and after states
      intercept[Exception] {
        VortexDelete.deleteImpl(spark, dir, col("m") < 5, failAfterCommits = 2)
      }
      // the pinned read of gen 0 is the COMPLETE before state
      assert(readV(dir, 0).count() == 2000L)
      assert(readV(dir, 0).filter(col("m") < 5).count() == 1000L)
      // the live read is per-file mixed (fewer rows, never duplicates)
      val live = spark.read.format("vortex").load(dir).count()
      assert(live < 2000L && live >= 1000L)
      // re-run converges and publishes the after generation
      VortexDelete.delete(spark, dir, col("m") < 5)
      assert(spark.read.format("vortex").load(dir).count() == 1000L)
      assert(readV(dir, 0).count() == 2000L) // still fully readable
    }
  }

  test("deletion-vector masks time-travel too (old mask generations retire)") {
    withTimeTravel {
      val dir = tmp(); stage(dir, files = 2)
      VortexDelete.delete(spark, dir, col("m") === 2, deletionVectors = true) // gen 1
      VortexDelete.delete(spark, dir, col("m") === 3, deletionVectors = true) // gen 2
      assert(readV(dir, 0).count() == 2000L)
      assert(readV(dir, 1).count() == 1800L)
      assert(readV(dir, 1).filter(col("m") === 3).count() == 200L)
      assert(readV(dir, 2).count() == 1600L)
      // folding masks into rewrites keeps every pinned past readable
      VortexMaintenance.foldMasks(spark, dir) // gen 3
      assert(readV(dir, 1).count() == 1800L)
      assert(readV(dir, 3).count() == 1600L)
      assert(spark.read.format("vortex").load(dir).count() == 1600L)
    }
  }

  test("SQL VERSION AS OF through the catalog; unknown generations fail loudly") {
    withTimeTravel {
      val dir = tmp(); stage(dir)
      VortexDelete.delete(spark, dir, col("m") === 0)
      spark.conf.set("spark.sql.catalog.vtx", "graft.sources.vortex.VortexCatalog")
      assert(spark.sql(s"SELECT count(*) c FROM vtx.`$dir` VERSION AS OF 0")
        .head.getLong(0) == 2000L)
      assert(spark.sql(s"SELECT count(*) c FROM vtx.`$dir` VERSION AS OF 1")
        .head.getLong(0) == 1800L)
      // a pinned read of a generation that never existed fails loudly
      val e2 = intercept[Exception] { readV(dir, 9).count() }
      assert(e2.getMessage.contains("generation 9"))
    }
  }

  test("partitioned datasets time-travel with partition pruning intact") {
    import spark.implicits._
    withTimeTravel {
      val dir = tmp()
      (0L until 1000L).map(i => (i, s"p${i % 2}", i % 10)).toDF("k", "p", "m")
        .write.format("vortex").option("partitionBy", "p").mode("overwrite").save(dir)
      VortexDelete.delete(spark, dir, col("m") === 0)
      assert(readV(dir, 0).count() == 1000L)
      assert(readV(dir, 0).filter(col("p") === "p0").count() == 500L)
      // m == 0 ⇔ k % 10 == 0 ⇒ k even ⇒ all in p0: p0 shrinks, p1 intact
      assert(readV(dir, 1).filter(col("p") === "p0").count() == 400L)
      assert(readV(dir, 1).filter(col("p") === "p1").count() == 500L)
      // partition values reconstruct from the snapshot's relative paths
      assert(readV(dir, 0).groupBy("p").count().count() == 2L)
    }
  }

  test("an EMPTY generation of a partitioned dataset keeps its partition columns (r13)") {
    import spark.implicits._
    withTimeTravel {
      val dir = tmp()
      (0L until 400L).map(i => (i, s"p${i % 2}")).toDF("k", "p")
        .write.format("vortex").option("partitionBy", "p").mode("overwrite").save(dir)
      VortexDelete.delete(spark, dir, lit(true)) // gen 1 is EMPTY
      spark.conf.set("spark.sql.catalog.vtx", "graft.sources.vortex.VortexCatalog")
      // the pinned empty generation must still resolve a reference to
      // the PARTITION column — its values live only in directory paths,
      // so the schema recovery reconstructs it from the manifest
      // entries' rel paths (review-found r13: the manifest-only form
      // dropped it and failed analysis here)
      assert(spark.sql(
        s"SELECT count(*) c FROM vtx.`$dir` VERSION AS OF 1 WHERE p = 'p0'")
        .head.getLong(0) == 0L)
      assert(spark.sql(s"SELECT count(*) c FROM vtx.`$dir` VERSION AS OF 0 WHERE p = 'p0'")
        .head.getLong(0) == 200L)
    }
  }

  test("expireVersions reclaims old generations; expired reads fail loudly") {
    withTimeTravel {
      val dir = tmp(); stage(dir)
      VortexDelete.delete(spark, dir, col("m") === 0) // gens 0,1
      VortexDelete.delete(spark, dir, col("m") === 1) // gen 2
      val (gens, files) = VortexMaintenance.expireVersions(spark, dir, keepLast = 1)
      assert(gens == 2 && files > 0, s"expected 2 generations dropped, got ($gens, $files)")
      val e = intercept[Exception] { readV(dir, 0).count() }
      assert(e.getMessage.contains("generation 0"))
      assert(readV(dir, 2).count() == 1600L)
      assert(spark.read.format("vortex").load(dir).count() == 1600L)
    }
  }

  test("retention contract: a reader PLANNED against gen N fails loudly mid-scan after expiry (r13)") {
    withTimeTravel {
      val dir = tmp(); stage(dir)
      VortexDelete.delete(spark, dir, col("m") === 0) // gens 0,1
      VortexDelete.delete(spark, dir, col("m") === 1) // gen 2
      // plan (and even execute once) against gen 0 — the plan carries
      // the resolved retired-file paths
      val pinned = readV(dir, 0)
      assert(pinned.count() == 2000L)
      // expiry reclaims gens 0-1 and their retired areas WHILE the
      // plan is alive (the Delta/Iceberg VACUUM precedent: retention
      // is an operator policy, not a reader lease)
      val (gens, files) = VortexMaintenance.expireVersions(spark, dir, keepLast = 1)
      assert(gens == 2 && files > 0)
      // re-executing the stale plan must fail LOUDLY (the retired
      // files under it are gone), never silently serve partial rows
      val e = intercept[Exception] { pinned.count() }
      def chain(t: Throwable): Seq[Throwable] =
        Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
      assert(chain(e).exists(c =>
          c.isInstanceOf[java.io.FileNotFoundException] ||
          Option(c.getMessage).exists(m =>
            m.contains("does not exist") || m.contains("FileNotFound") ||
            m.contains("generation"))), s"wanted a loud read failure, got $e")
      // a FRESH resolution of the expired generation also fails loudly
      val e2 = intercept[Exception] { readV(dir, 0).count() }
      assert(e2.getMessage.contains("generation 0"))
      // and the retained generation + live read stay exact
      assert(readV(dir, 2).count() == 1600L)
      assert(spark.read.format("vortex").load(dir).count() == 1600L)
    }
  }

  test("a dataset WITHOUT time travel keeps today's behavior: no log, plain deletes") {
    val dir = tmp(); stage(dir, files = 2)
    VortexDelete.delete(spark, dir, col("m") === 0)
    assert(!fs.exists(new Path(dir, ".vortex-commits")))
    assert(spark.read.format("vortex").load(dir).count() == 1800L)
    // but once a log exists (an op ran with the conf on), later ops
    // keep it current even with the conf off
    withTimeTravel { VortexDelete.delete(spark, dir, col("m") === 1) } // gens 0,1
    VortexDelete.delete(spark, dir, col("m") === 2) // conf off → still logs gen 2
    assert(VortexCommitLog.latestGen(fs, new Path(dir)).contains(2))
    assert(readV(dir, 1).count() == 1600L)
    assert(readV(dir, 2).count() == 1400L)
    assert(readV(dir, 0).count() == 1800L)
  }
}
