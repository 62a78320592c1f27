package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pure-SQL UPDATE / MERGE statements over vortex datasets
  * (plans/VortexDmlRules): the analyzed UpdateTable / MergeIntoTable
  * plans route into VortexUpdate / VortexMerge.mergeClauses through a
  * post-hoc resolution rule — a SQL-first user gets full DML without
  * touching the Scala API. */
class VortexSqlDmlSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.catalog.vtx", "graft.sources.vortex.VortexCatalog")
      .getOrCreate()
    // getOrCreate may reuse another suite's session, where builder
    // extensions never applied — use the runtime install path (also
    // the path a library user takes on an existing session)
    graft.plans.RewriteVortexDml.install(s)
    s.conf.set("spark.sql.catalog.vtx", "graft.sources.vortex.VortexCatalog")
    s
  }

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("vortex_sqldml").toString

  test("SQL UPDATE: SET expressions + WHERE, file-granular rewrite") {
    import spark.implicits._
    val dir = tmp()
    (0L until 1000L).map(i => (i, i * 2, s"r$i")).toDF("id", "v", "s")
      .coalesce(1).write.format("vortex").mode("overwrite").save(dir)
    spark.sql(s"UPDATE vtx.`$dir` SET v = v * 10 + id, s = 'redacted' WHERE id < 10")
    val after = spark.read.format("vortex").load(dir)
    assert(after.count() == 1000L)
    assert(after.where(col("s") === "redacted").count() == 10L)
    assert(after.where(col("id") === 4L).select("v").head().getLong(0) == 84L)
    assert(after.where(col("id") === 500L).select("v").head().getLong(0) == 1000L)
  }

  test("SQL UPDATE takes the mask tier under the session conf") {
    val s2 = spark.newSession()
    graft.plans.RewriteVortexDml.install(s2)
    s2.conf.set("spark.sql.catalog.vtx", "graft.sources.vortex.VortexCatalog")
    s2.conf.set("spark.graft.vortex.deletionVectors", "true")
    import s2.implicits._
    val dir = tmp()
    (0L until 1000L).map(i => (i, i)).toDF("id", "v").coalesce(1)
      .write.format("vortex").mode("overwrite").save(dir)
    s2.sql(s"UPDATE vtx.`$dir` SET v = -1 WHERE id = 77")
    val fs = new Path(dir).getFileSystem(s2.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new Path(dir)).map(_.getPath.getName)
    assert(names.exists(_.contains(".dv-")), s"expected a mask sidecar: ${names.toSeq}")
    assert(names.exists(_.startsWith("part-updv-")), s"expected an updv append: ${names.toSeq}")
    val after = s2.read.format("vortex").load(dir)
    assert(after.count() == 1000L)
    assert(after.where(col("id") === 77L).select("v").head().getLong(0) == -1L)
  }

  test("SQL MERGE: whole-row UPDATE SET * / INSERT *") {
    import spark.implicits._
    val dir = tmp()
    (0L until 100L).map(i => (i, i * 2, 1.0)).toDF("id", "v", "q")
      .coalesce(1).write.format("vortex").mode("overwrite").save(dir)
    Seq((5L, -5L, 9.0), (500L, -500L, 9.0)).toDF("id", "v", "q")
      .createOrReplaceTempView("mrg_src1")
    spark.sql(
      s"""MERGE INTO vtx.`$dir` t USING mrg_src1 s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val after = spark.read.format("vortex").load(dir)
    assert(after.count() == 101L)
    assert(after.where(col("id") === 5L).select("v").head().getLong(0) == -5L)
    assert(after.where(col("id") === 500L).count() == 1L)
    assert(after.where(col("id") === 6L).select("v").head().getLong(0) == 12L)
  }

  test("SQL MERGE: conditional UPDATE SET subset, DELETE, conditional INSERT") {
    import spark.implicits._
    val dir = tmp()
    (0L until 100L).map(i => (i, i * 2, 1.0)).toDF("id", "v", "q")
      .coalesce(1).write.format("vortex").mode("overwrite").save(dir)
    // s.q gates the clauses: q=2 → delete, q=3 → update v only,
    // inserts only when s.v >= 0
    Seq((10L, 111L, 2.0),   // matched, q=2 → DELETE
        (20L, 222L, 3.0),   // matched, q=3 → UPDATE v = s.v (q untouched)
        (30L, 333L, 7.0),   // matched, no clause fires → kept verbatim
        (900L, 999L, 3.0),  // not matched, v>=0 → INSERT
        (901L, -1L, 3.0))   // not matched, v<0 → skipped
      .toDF("id", "v", "q").createOrReplaceTempView("mrg_src2")
    spark.sql(
      s"""MERGE INTO vtx.`$dir` t USING mrg_src2 s ON t.id = s.id
         |WHEN MATCHED AND s.q = 2.0 THEN DELETE
         |WHEN MATCHED AND s.q = 3.0 THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED AND s.v >= 0 THEN INSERT (id, v, q) VALUES (s.id, s.v, s.q)""".stripMargin)
    val after = spark.read.format("vortex").load(dir)
    assert(after.count() == 100L) // -1 deleted, +1 inserted
    assert(after.where(col("id") === 10L).count() == 0L, "DELETE clause")
    assert(after.where(col("id") === 20L).select("v").head().getLong(0) == 222L)
    assert(after.where(col("id") === 20L).select("q").head().getDouble(0) == 1.0,
      "partial SET must leave q untouched")
    assert(after.where(col("id") === 30L).select("v").head().getLong(0) == 60L,
      "matched row with no firing clause stays verbatim")
    assert(after.where(col("id") === 900L).count() == 1L)
    assert(after.where(col("id") === 901L).count() == 0L, "conditional INSERT")
  }

  test("SQL MERGE: clause order wins; NULL keys never match; dup target rows all update") {
    import spark.implicits._
    val dir = tmp()
    // duplicate target keys + a null-key target row
    (Seq((1L, 10L), (1L, 11L), (2L, 20L)).map { case (k, v) => (Option(k), v) } :+
      ((None: Option[Long], 30L)))
      .toDF("id", "v").coalesce(1)
      .write.format("vortex").mode("overwrite").save(dir)
    (Seq((Option(1L), -1L), (None: Option[Long], -2L)))
      .toDF("id", "v").createOrReplaceTempView("mrg_src3")
    spark.sql(
      s"""MERGE INTO vtx.`$dir` t USING mrg_src3 s ON t.id = s.id
         |WHEN MATCHED AND t.v >= 11 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val after = spark.read.format("vortex").load(dir)
    // id=1/v=10 → second clause updates to -1; id=1/v=11 → first clause deletes;
    // null-key target kept; null-key source inserted
    assert(after.count() == 4L)
    assert(after.where(col("id") === 1L).count() == 1L)
    assert(after.where(col("id") === 1L).select("v").head().getLong(0) == -1L)
    assert(after.where(col("id").isNull).count() == 2L)
    assert(after.where(col("v") === 30L).count() == 1L)
    assert(after.where(col("v") === -2L).count() == 1L)
  }

  test("all-identity SET is a legal no-op; statement identity survives re-analysis") {
    import spark.implicits._
    val dir = tmp()
    (0L until 50L).map(i => (i, i)).toDF("id", "v").coalesce(1)
      .write.format("vortex").mode("overwrite").save(dir)
    // UPDATE t SET v = v — every engine accepts this as a no-op
    spark.sql(s"UPDATE vtx.`$dir` SET v = v WHERE id < 5")
    assert(spark.read.format("vortex").load(dir)
      .agg(sum("v")).head().getLong(0) == (0L until 50L).sum)

    // the exactly-once insert marker must be ANALYSIS-INDEPENDENT:
    // exprIds reallocate on every analysis (and on every JVM), so two
    // executions of the same statement TEXT must derive the same
    // part-merge-ins name — a crash re-run on a fresh JVM depends on it
    def insName(d: String): String = {
      Seq((500L, 1L)).toDF("id", "v").createOrReplaceTempView("fp_src")
      spark.sql(s"""MERGE INTO vtx.`$d` t USING fp_src s ON t.id = s.id
                   |WHEN MATCHED AND s.v > 0 THEN UPDATE SET v = s.v
                   |WHEN NOT MATCHED AND s.v > 0 THEN INSERT *""".stripMargin)
      val fs = new Path(d).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new Path(d)).map(_.getPath.getName)
        .find(_.startsWith("part-merge-ins-"))
        .getOrElse(fail("no insert file"))
    }
    val d1 = tmp(); val d2 = tmp()
    Seq((0L, 0L)).toDF("id", "v").coalesce(1)
      .write.format("vortex").mode("overwrite").save(d1)
    Seq((0L, 0L)).toDF("id", "v").coalesce(1)
      .write.format("vortex").mode("overwrite").save(d2)
    assert(insName(d1) == insName(d2),
      "insert-marker name must not depend on analysis-time exprIds")
  }

  test("unsupported SQL shapes fail loudly") {
    import spark.implicits._
    val dir = tmp()
    (0L until 10L).map(i => (i, i)).toDF("id", "v").coalesce(1)
      .write.format("vortex").mode("overwrite").save(dir)
    Seq((1L, 1L)).toDF("id", "v").createOrReplaceTempView("mrg_src4")
    def msgOf(t: Throwable): String =
      Option(t.getMessage).getOrElse("") +
        Option(t.getCause).map(msgOf).getOrElse("")
    // non-equality ON
    val e2 = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO vtx.`$dir` t USING mrg_src4 s ON t.id > s.id
           |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    }
    assert(msgOf(e2).contains("conjunction"), msgOf(e2))
    // CORRELATED equality-EXISTS in UPDATE WHERE is SUPPORTED since r13
    // (rewritten into MERGE — see VortexCorrelatedDmlSpec); the still-
    // rejected shape is NON-equality correlation.
    Seq(1L).toDF("ck").createOrReplaceTempView("corr_src")
    val e3 = intercept[Exception] {
      spark.sql(s"UPDATE vtx.`$dir` SET v = 0 " +
        "WHERE EXISTS (SELECT 1 FROM corr_src WHERE ck < v)")
    }
    assert(msgOf(e3).toLowerCase.contains("correlat"), msgOf(e3))
  }
}
