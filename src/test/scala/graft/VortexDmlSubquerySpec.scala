package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r12 DML surfaces (VERDICT r11 next #4/#5):
  *  - bounded subqueries in UPDATE/DELETE predicates, SET values and
  *    MERGE clause conditions (plans/DmlSubqueries — driver-evaluated
  *    once under a hard cap, substituted as literals so manifest/bloom
  *    pruning applies);
  *  - MERGE `WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE/DELETE`
  *    (full-candidate scan, target-only binding).
  */
class VortexDmlSubquerySpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.catalog.vtx", "graft.sources.vortex.VortexCatalog")
      .getOrCreate()
    graft.plans.RewriteVortexDml.install(s)
    s.conf.set("spark.sql.catalog.vtx", "graft.sources.vortex.VortexCatalog")
    s
  }

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("vortex_dmlsubq").toString

  private def stage(n: Long): String = {
    import spark.implicits._
    val dir = tmp()
    (0L until n).map(i => (i, i * 2, s"src${i % 5}")).toDF("id", "v", "src")
      .repartition(4).write.format("vortex").mode("overwrite").save(dir)
    dir
  }

  test("UPDATE WHERE id IN (SELECT …): audit-table re-scoring") {
    import spark.implicits._
    val dir = stage(1000)
    Seq(3L, 7L, 9999L).toDF("bad_id").createOrReplaceTempView("audit1")
    spark.sql(s"UPDATE vtx.`$dir` SET v = -1 " +
      "WHERE id IN (SELECT bad_id FROM audit1)")
    val after = spark.read.format("vortex").load(dir)
    assert(after.where(col("v") === -1L).count() == 2L)
    assert(after.where(col("id") === 3L).select("v").head().getLong(0) == -1L)
    assert(after.where(col("id") === 8L).select("v").head().getLong(0) == 16L)
  }

  test("DELETE WHERE id IN (SELECT …): the corpus-purge shape, both tiers") {
    import spark.implicits._
    for (dv <- Seq(false, true)) {
      val s2 = spark.newSession()
      graft.plans.RewriteVortexDml.install(s2)
      s2.conf.set("spark.sql.catalog.vtx", "graft.sources.vortex.VortexCatalog")
      if (dv) s2.conf.set("spark.graft.vortex.deletionVectors", "true")
      val dir = stage(500)
      // temp views are PER-SESSION — register on the session that runs
      locally { import s2.implicits._
        Seq(1L, 2L, 499L).toDF("purge_id").createOrReplaceTempView("audit2") }
      s2.sql(s"DELETE FROM vtx.`$dir` WHERE id IN (SELECT purge_id FROM audit2)")
      val after = s2.read.format("vortex").load(dir)
      assert(after.count() == 497L, s"dv=$dv")
      assert(after.where(col("id").isin(1L, 2L, 499L)).count() == 0L, s"dv=$dv")
      if (dv) {
        val fs = new Path(dir).getFileSystem(s2.sparkContext.hadoopConfiguration)
        assert(fs.listStatus(new Path(dir)).map(_.getPath.getName)
          .exists(_.contains(".dv-")), "mask tier expected a sidecar")
      }
    }
  }

  test("NOT IN, EXISTS, and scalar subqueries; empty IN result is FALSE") {
    import spark.implicits._
    val dir = stage(100)
    Seq(0L, 1L).toDF("k").createOrReplaceTempView("keep3")
    // NOT IN over a non-empty list
    spark.sql(s"UPDATE vtx.`$dir` SET src = 'other' " +
      "WHERE id < 4 AND id NOT IN (SELECT k FROM keep3)")
    val a1 = spark.read.format("vortex").load(dir)
    assert(a1.where(col("src") === "other").count() == 2L) // ids 2,3
    // EXISTS gate (uncorrelated): fires for all rows
    spark.sql(s"UPDATE vtx.`$dir` SET v = 0 " +
      "WHERE id = 50 AND EXISTS (SELECT 1 FROM keep3 WHERE k = 0)")
    assert(spark.read.format("vortex").load(dir)
      .where(col("id") === 50L).select("v").head().getLong(0) == 0L)
    // scalar subquery in SET value
    spark.sql(s"UPDATE vtx.`$dir` SET v = (SELECT max(k) FROM keep3) WHERE id = 51")
    assert(spark.read.format("vortex").load(dir)
      .where(col("id") === 51L).select("v").head().getLong(0) == 1L)
    // empty subquery result: IN (∅) is FALSE — a no-op, not an error
    spark.sql(s"UPDATE vtx.`$dir` SET v = -99 " +
      "WHERE id IN (SELECT k FROM keep3 WHERE k > 100)")
    assert(spark.read.format("vortex").load(dir)
      .where(col("v") === -99L).count() == 0L)
  }

  test("oversized IN subquery fails loudly at the cap; EXPLAIN does not execute") {
    import spark.implicits._
    val s2 = spark.newSession()
    graft.plans.RewriteVortexDml.install(s2)
    s2.conf.set("spark.sql.catalog.vtx", "graft.sources.vortex.VortexCatalog")
    s2.conf.set(graft.plans.DmlSubqueries.MaxRowsConf, "10")
    val dir = stage(100)
    locally { import s2.implicits._
      (0L until 50L).toDF("k").createOrReplaceTempView("big4") }
    def msgOf(t: Throwable): String =
      Option(t.getMessage).getOrElse("") +
        Option(t.getCause).map(m => msgOf(m)).getOrElse("")
    val e = intercept[Exception] {
      s2.sql(s"UPDATE vtx.`$dir` SET v = 0 WHERE id IN (SELECT k FROM big4)")
    }
    assert(msgOf(e).contains("dmlSubqueryMaxRows"), msgOf(e))
    // EXPLAIN plans the command without running the subquery or the update
    s2.sql(s"EXPLAIN UPDATE vtx.`$dir` SET v = 0 WHERE id IN (SELECT k FROM big4)")
      .collect()
    assert(s2.read.format("vortex").load(dir)
      .where(col("v") === 0L).count() == 1L) // only id=0 (v=id*2)
  }

  test("IN-list literals reach the scan: manifest pruning applies") {
    import spark.implicits._
    val dir = tmp()
    // 4 range-disjoint files; an IN over ids 0..9 must plan 1 candidate
    (0L until 4000L).map(i => (i, i)).toDF("id", "v")
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
      .write.format("vortex").mode("overwrite").save(dir)
    Seq(3L, 7L).toDF("k").createOrReplaceTempView("tiny5")
    spark.sql(s"UPDATE vtx.`$dir` SET v = -1 WHERE id IN (SELECT k FROM tiny5)")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rewritten = fs.listStatus(new Path(dir)).map(_.getPath.getName)
      .count(_.startsWith("part-update-"))
    assert(rewritten == 1,
      s"min/max pruning should leave 3 of 4 range-disjoint files untouched, rewrote $rewritten")
    assert(spark.read.format("vortex").load(dir)
      .where(col("v") === -1L).count() == 2L)

    // above the In→InSet threshold (the sf1-measured hot path: a
    // multi-thousand-literal In degrades to interpreted linear scans),
    // the materialized InSet must prune identically and stay fast
    import spark.implicits._
    (100L until 400L).toDF("k").createOrReplaceTempView("big5")
    spark.sql(s"UPDATE vtx.`$dir` SET v = -2 WHERE id IN (SELECT k FROM big5)")
    val rewritten2 = fs.listStatus(new Path(dir)).map(_.getPath.getName)
      .count(_.startsWith("part-update-"))
    assert(rewritten2 == 1, s"InSet form must prune the same, rewrote $rewritten2")
    assert(spark.read.format("vortex").load(dir)
      .where(col("v") === -2L).count() == 300L)
  }

  test("MERGE clause conditions accept uncorrelated subqueries") {
    import spark.implicits._
    val dir = stage(100)
    Seq((5L, 555L, "m"), (200L, 999L, "m")).toDF("id", "v", "src")
      .createOrReplaceTempView("msrc6")
    Seq(1L).toDF("flag").createOrReplaceTempView("flags6")
    spark.sql(
      s"""MERGE INTO vtx.`$dir` t USING msrc6 s ON t.id = s.id
         |WHEN MATCHED AND (SELECT max(flag) FROM flags6) = 1 THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED AND EXISTS (SELECT 1 FROM flags6) THEN INSERT *""".stripMargin)
    val after = spark.read.format("vortex").load(dir)
    assert(after.where(col("id") === 5L).select("v").head().getLong(0) == 555L)
    assert(after.where(col("id") === 200L).count() == 1L)
  }

  test("NOT MATCHED BY SOURCE: UPDATE and DELETE, conditions, clause order") {
    import spark.implicits._
    val dir = stage(100) // ids 0..99, v = 2*id
    // source covers ids 10..19 → 90 rows are "not matched by source"
    (10L until 20L).map(i => (i, -i, "S")).toDF("id", "v", "src")
      .createOrReplaceTempView("nmbs7")
    spark.sql(
      s"""MERGE INTO vtx.`$dir` t USING nmbs7 s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED BY SOURCE AND t.id >= 90 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE AND t.id < 5 THEN UPDATE SET src = 'DORMANT'""".stripMargin)
    val after = spark.read.format("vortex").load(dir)
    assert(after.count() == 90L, "ids 90..99 deleted")
    assert(after.where(col("src") === "DORMANT").count() == 5L, "ids 0..4 marked")
    assert(after.where(col("id") === 15L).select("v").head().getLong(0) == -15L,
      "matched rows still updated")
    assert(after.where(col("id") === 50L).select("v").head().getLong(0) == 100L,
      "unmatched rows hit by no NMBS clause stay verbatim")
  }

  test("NOT MATCHED BY SOURCE alone (no other clauses); all three families together") {
    import spark.implicits._
    val dir = stage(50)
    Seq((10L, 0L, "x")).toDF("id", "v", "src").createOrReplaceTempView("nmbs8")
    // prune-everything-not-in-source: the retention shape
    spark.sql(
      s"""MERGE INTO vtx.`$dir` t USING nmbs8 s ON t.id = s.id
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    val a1 = spark.read.format("vortex").load(dir)
    assert(a1.count() == 1L)
    assert(a1.select("id").head().getLong(0) == 10L)
    assert(a1.select("v").head().getLong(0) == 20L, "matched row untouched (no MATCHED clause)")

    // all three clause families in one statement
    val dir2 = stage(10) // ids 0..9
    Seq((5L, -5L, "S"), (100L, -100L, "S")).toDF("id", "v", "src")
      .createOrReplaceTempView("nmbs9")
    spark.sql(
      s"""MERGE INTO vtx.`$dir2` t USING nmbs9 s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE AND t.id % 2 = 0 THEN DELETE""".stripMargin)
    val a2 = spark.read.format("vortex").load(dir2)
    // 0,2,4(no—5 matched),6,8 even&unmatched deleted: 0,2,4,6,8 minus… id 5 matched;
    // evens 0,2,4,6,8 all unmatched → deleted (5 rows); insert id=100
    assert(a2.count() == 10L - 5L + 1L)
    assert(a2.where(col("id") === 5L).select("v").head().getLong(0) == -5L)
    assert(a2.where(col("id") === 100L).count() == 1L)
    assert(a2.where(col("id") === 2L).count() == 0L)
    assert(a2.where(col("id") === 3L).count() == 1L)
  }

  test("NMBS statement identity is stable across analyses (exactly-once names)") {
    import spark.implicits._
    def insName(d: String): String = {
      Seq((500L, 1L)).toDF("id", "v").createOrReplaceTempView("fp_nmbs")
      spark.sql(s"""MERGE INTO vtx.`$d` t USING fp_nmbs s ON t.id = s.id
                   |WHEN NOT MATCHED THEN INSERT *
                   |WHEN NOT MATCHED BY SOURCE AND v < 0 THEN DELETE""".stripMargin)
      val fs = new Path(d).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new Path(d)).map(_.getPath.getName)
        .find(_.startsWith("part-merge-ins-"))
        .getOrElse(fail("no insert file"))
    }
    val d1 = tmp(); val d2 = tmp()
    Seq((0L, 10L)).toDF("id", "v").coalesce(1)
      .write.format("vortex").mode("overwrite").save(d1)
    Seq((0L, 10L)).toDF("id", "v").coalesce(1)
      .write.format("vortex").mode("overwrite").save(d2)
    assert(insName(d1) == insName(d2))
    // and a subquery-bearing statement also derives a stable name
    def insNameSubq(d: String): String = {
      Seq((700L, 1L)).toDF("id", "v").createOrReplaceTempView("fp_sq")
      Seq(1L).toDF("g").createOrReplaceTempView("fp_gate")
      spark.sql(s"""MERGE INTO vtx.`$d` t USING fp_sq s ON t.id = s.id
                   |WHEN NOT MATCHED AND EXISTS (SELECT 1 FROM fp_gate) THEN INSERT *""".stripMargin)
      val fs = new Path(d).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new Path(d)).map(_.getPath.getName)
        .find(_.startsWith("part-merge-ins-"))
        .getOrElse(fail("no insert file"))
    }
    val d3 = tmp(); val d4 = tmp()
    Seq((0L, 10L)).toDF("id", "v").coalesce(1)
      .write.format("vortex").mode("overwrite").save(d3)
    Seq((0L, 10L)).toDF("id", "v").coalesce(1)
      .write.format("vortex").mode("overwrite").save(d4)
    assert(insNameSubq(d3) == insNameSubq(d4))
  }

  test("a DELETE-emptied dataset still resolves: schema from manifests, DML no-ops") {
    import spark.implicits._
    val dir = stage(100)
    // empty the dataset entirely (every file drops whole)
    spark.sql(s"DELETE FROM vtx.`$dir` WHERE id >= 0")
    assert(spark.read.format("vortex").load(dir).count() == 0L,
      "empty dataset must scan as zero rows (manifest-held schema)")
    // SQL over the emptied table — catalog resolution + a subquery over
    // the same emptied table must analyze and no-op (fuzz-found r12)
    spark.sql(s"UPDATE vtx.`$dir` SET v = 0 " +
      s"WHERE id IN (SELECT id FROM vtx.`$dir` WHERE v > 5)")
    assert(spark.sql(s"SELECT * FROM vtx.`$dir`").count() == 0L)
  }

  test("NMBS UPDATE cannot move rows across partitions; guards still fire") {
    import spark.implicits._
    val dir = tmp()
    (0L until 100L).map(i => (i, i * 2, s"p${i % 2}")).toDF("id", "v", "pt")
      .write.format("vortex").option("partitionBy", "pt")
      .mode("overwrite").save(dir)
    Seq((1L, 0L, "p1")).toDF("id", "v", "pt").createOrReplaceTempView("nmbs10")
    def msgOf(t: Throwable): String =
      Option(t.getMessage).getOrElse("") +
        Option(t.getCause).map(m => msgOf(m)).getOrElse("")
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO vtx.`$dir` t USING nmbs10 s ON t.id = s.id
           |WHEN NOT MATCHED BY SOURCE AND t.id = 4 THEN UPDATE SET pt = 'p9'""".stripMargin)
    }
    assert(msgOf(e).contains("partition column"), msgOf(e))
    // dataset unchanged (tasks are non-destructive)
    assert(spark.read.format("vortex").load(dir).count() == 100L)
  }
}
