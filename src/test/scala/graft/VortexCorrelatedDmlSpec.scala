package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r13 correlated DML (VERDICT r12 "What's missing" #1): correlated
  * scalar SET values and correlated [NOT] EXISTS WHERE predicates in
  * UPDATE/DELETE rewrite into the bounded-broadcast MERGE machinery at
  * analysis time (plans/CorrelatedDml + RewriteVortexDml). ANSI edges:
  * scalar-over-zero-rows assigns NULL; two subquery rows for one key
  * error loudly; unsupported correlation shapes reject at analysis. */
class VortexCorrelatedDmlSpec extends AnyFunSuite {
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
    java.nio.file.Files.createTempDirectory("vortex_corrdml").toString

  private def stage(n: Long): String = {
    import spark.implicits._
    val dir = tmp()
    // v nullable (boxed): ANSI rejects assigning NULL to a NOT NULL
    // column, and the scalar-over-zero-rows path assigns exactly that
    (0L until n).map(i => (i, java.lang.Long.valueOf(i * 2), s"g${i % 4}"))
      .toDF("id", "v", "g")
      .repartition(4).write.format("vortex").mode("overwrite").save(dir)
    dir
  }

  test("correlated scalar SET: matched rows assign, unmatched assign NULL (ANSI)") {
    import spark.implicits._
    val dir = stage(100)
    // scores exist for ids 0..49 only
    (0L until 50L).map(i => (i, i + 1000L)).toDF("sid", "score")
      .createOrReplaceTempView("corr_scores")
    spark.sql(s"""UPDATE vtx.`$dir` t
                  SET v = (SELECT score FROM corr_scores s WHERE s.sid = t.id)
                  WHERE g = 'g1'""")
    val after = spark.read.format("vortex").load(dir)
    // g1 = ids 1,5,9,… — matched (id<50) get score, unmatched get NULL
    assert(after.where(col("id") === 5L).head().getLong(1) == 1005L)
    assert(after.where(col("id") === 53L).head().isNullAt(1)) // g1, unmatched → NULL
    assert(after.where(col("id") === 6L).head().getLong(1) == 12L) // g2: untouched
    assert(after.where(col("g") === "g1" && col("v").isNull).count() ==
      after.where(col("g") === "g1" && col("id") >= 50L).count())
  }

  test("correlated scalar SET inside an expression: f(subquery) and f(NULL)") {
    import spark.implicits._
    val dir = stage(40)
    (0L until 10L).map(i => (i, i * 10L)).toDF("sid", "score")
      .createOrReplaceTempView("corr_scores2")
    spark.sql(s"""UPDATE vtx.`$dir` t
                  SET v = coalesce((SELECT score FROM corr_scores2 s
                                    WHERE s.sid = t.id), -1)""")
    val after = spark.read.format("vortex").load(dir)
    assert(after.where(col("id") === 3L).head().getLong(1) == 30L)
    assert(after.where(col("id") === 25L).head().getLong(1) == -1L) // f(NULL) = -1
  }

  test("two subquery rows for one key error loudly (ANSI scalar cardinality)") {
    import spark.implicits._
    val dir = stage(20)
    Seq((1L, 10L), (1L, 20L)).toDF("sid", "score")
      .createOrReplaceTempView("corr_dup")
    val e = intercept[Exception] {
      spark.sql(s"""UPDATE vtx.`$dir` t
                    SET v = (SELECT score FROM corr_dup s WHERE s.sid = t.id)""")
    }
    assert(e.getMessage.contains("more than one row"), e.getMessage)
  }

  test("a duplicated key matching NO targeted row is NOT an error (ANSI, r14)") {
    import spark.implicits._
    val dir = stage(20)
    // sid=1 is duplicated, but the WHERE targets only g='g2' rows
    // (ids 2,6,10,14,18) — id 1 is g1, so the subquery never evaluates
    // for a row with key 1 and ANSI (and DuckDB) do NOT error
    Seq((1L, 10L), (1L, 20L), (2L, 200L), (6L, 600L)).toDF("sid", "score")
      .createOrReplaceTempView("corr_dup2")
    spark.sql(s"""UPDATE vtx.`$dir` t
                  SET v = (SELECT score FROM corr_dup2 s WHERE s.sid = t.id)
                  WHERE g = 'g2'""")
    val after = spark.read.format("vortex").load(dir)
    assert(after.where(col("id") === 2L).head().getLong(1) == 200L)
    assert(after.where(col("id") === 6L).head().getLong(1) == 600L)
    assert(after.where(col("id") === 10L).head().isNullAt(1)) // g2, unmatched
    assert(after.where(col("id") === 1L).head().getLong(1) == 2L) // g1: untouched
    // …but targeting the duplicated key DOES error
    val e = intercept[Exception] {
      spark.sql(s"""UPDATE vtx.`$dir` t
                    SET v = (SELECT score FROM corr_dup2 s WHERE s.sid = t.id)
                    WHERE g = 'g1'""")
    }
    assert(e.getMessage.contains("more than one row"), e.getMessage)
  }

  test("correlated AGGREGATE SET: per-key pre-aggregation, ANSI empty-group values (r14)") {
    import spark.implicits._
    val dir = stage(40)
    // several source rows per key — an aggregate NEVER cardinality-errors
    (0L until 60L).map(i => (i % 10, i)).toDF("sid", "x")
      .createOrReplaceTempView("corr_agg")
    spark.sql(s"""UPDATE vtx.`$dir` t
                  SET v = (SELECT max(x) FROM corr_agg s WHERE s.sid = t.id)""")
    val after = spark.read.format("vortex").load(dir)
    // key 3: max(x | x%10=3) over 0..59 = 53
    assert(after.where(col("id") === 3L).head().getLong(1) == 53L)
    // keys 10..39 have no source rows: max over empty → NULL
    assert(after.where(col("id") === 25L).head().isNullAt(1))
    assert(after.where(col("id") >= 10L && col("v").isNull).count() == 30L)
  }

  test("correlated COUNT SET: missing keys get 0, not NULL (the count bug) (r14)") {
    import spark.implicits._
    val dir = stage(20)
    (0L until 30L).map(i => (i % 5, i)).toDF("sid", "x")
      .createOrReplaceTempView("corr_cnt")
    spark.sql(s"""UPDATE vtx.`$dir` t
                  SET v = (SELECT count(*) FROM corr_cnt s WHERE s.sid = t.id)""")
    val after = spark.read.format("vortex").load(dir)
    assert(after.where(col("id") === 2L).head().getLong(1) == 6L)  // 6 rows per key
    assert(after.where(col("id") === 15L).head().getLong(1) == 0L) // COUNT over empty = 0
    assert(after.where(col("v").isNull).count() == 0L)
  }

  test("correlated aggregate inside an expression + uncorrelated inner filter (r14)") {
    import spark.implicits._
    val dir = stage(20)
    (0L until 40L).map(i => (i % 8, i, if (i % 2 == 0) "ok" else "bad"))
      .toDF("sid", "x", "st").createOrReplaceTempView("corr_aggf")
    spark.sql(s"""UPDATE vtx.`$dir` t
                  SET v = coalesce((SELECT sum(x) FROM corr_aggf s
                                    WHERE s.sid = t.id AND s.st = 'ok'), -1)
                  WHERE g IN ('g0', 'g1')""")
    val after = spark.read.format("vortex").load(dir)
    // key 4: even sids come from even x values — x in {4,12,20,28,36} all 'ok' → 100
    assert(after.where(col("id") === 4L).head().getLong(1) == 100L)
    // key 9 ('g1'): no source rows ≥8 → sum over empty = NULL → coalesce → -1
    assert(after.where(col("id") === 9L).head().getLong(1) == -1L)
    // g2/g3 rows untouched
    assert(after.where(col("id") === 2L).head().getLong(1) == 4L)
  }

  test("DELETE WHERE EXISTS (corr) with an extra predicate") {
    import spark.implicits._
    val dir = stage(100)
    Seq(2L, 4L, 6L, 999L).toDF("bad").createOrReplaceTempView("corr_bad")
    spark.sql(s"""DELETE FROM vtx.`$dir` t
                  WHERE EXISTS (SELECT 1 FROM corr_bad b WHERE b.bad = t.id)
                    AND v > 5""")
    val after = spark.read.format("vortex").load(dir)
    assert(after.count() == 98L) // ids 4 and 6 deleted; id 2 kept (v=4 ≤ 5)
    assert(after.where(col("id") === 2L).count() == 1L)
    assert(after.where(col("id") === 4L).count() == 0L)
  }

  test("UPDATE WHERE NOT EXISTS (corr): not-matched-by-source rows only") {
    import spark.implicits._
    val dir = stage(40)
    (0L until 30L).map(i => Tuple1(i)).toDF("kid").createOrReplaceTempView("corr_keep")
    spark.sql(s"""UPDATE vtx.`$dir` t SET g = 'orphan'
                  WHERE NOT EXISTS (SELECT 1 FROM corr_keep k WHERE k.kid = t.id)""")
    val after = spark.read.format("vortex").load(dir)
    assert(after.where(col("g") === "orphan").count() == 10L) // ids 30..39
    assert(after.where(col("id") === 35L).head().getString(2) == "orphan")
    assert(after.where(col("id") === 5L).head().getString(2) == "g1")
  }

  test("DELETE WHERE NOT EXISTS (corr): purge rows absent from the keep-list") {
    import spark.implicits._
    val dir = stage(50)
    (0L until 20L).map(i => Tuple1(i * 2)).toDF("kid")
      .createOrReplaceTempView("corr_keep2")
    spark.sql(s"""DELETE FROM vtx.`$dir` t
                  WHERE NOT EXISTS (SELECT 1 FROM corr_keep2 k WHERE k.kid = t.id)""")
    val after = spark.read.format("vortex").load(dir)
    assert(after.count() == 20L)
    assert(after.where(col("id") % 2 =!= 0).count() == 0L)
  }

  test("uncorrelated filters inside the EXISTS fold into the source") {
    import spark.implicits._
    val dir = stage(60)
    (0L until 60L).map(i => (i, if (i < 10) "hot" else "cold")).toDF("sid", "temp")
      .createOrReplaceTempView("corr_temp")
    spark.sql(s"""DELETE FROM vtx.`$dir` t
                  WHERE EXISTS (SELECT 1 FROM corr_temp s
                                WHERE s.sid = t.id AND s.temp = 'hot')""")
    assert(spark.read.format("vortex").load(dir).count() == 50L)
  }

  test("unsupported correlation shapes reject loudly at analysis") {
    import spark.implicits._
    val dir = stage(10)
    (0L until 5L).map(i => (i, i * 10L)).toDF("sid", "score")
      .createOrReplaceTempView("corr_rej")
    // non-equality correlation
    val e1 = intercept[Exception] {
      spark.sql(s"""DELETE FROM vtx.`$dir` t
                    WHERE EXISTS (SELECT 1 FROM corr_rej s WHERE s.sid < t.id)""")
    }
    assert(e1.getMessage.contains("correlation must be bare"), e1.getMessage)
    // correlated aggregate with its OWN group by (>1 row per key)
    val e2 = intercept[Exception] {
      spark.sql(s"""UPDATE vtx.`$dir` t
                    SET v = (SELECT max(score) FROM corr_rej s
                             WHERE s.sid = t.id GROUP BY s.score)""")
    }
    // message differs by rewrite context (analysis-time names the GROUP
    // BY; optimizer-time decorrelation reshapes first) — any LOUD
    // reject is the contract
    assert(e2.getMessage.toLowerCase.contains("group by") ||
      e2.getMessage.contains("cardinality") ||
      e2.getMessage.contains("unsupported correlated subquery shape"),
      e2.getMessage)
    // aggregate under EXISTS (always-true trap)
    val e2b = intercept[Exception] {
      spark.sql(s"""DELETE FROM vtx.`$dir` t
                    WHERE EXISTS (SELECT max(score) FROM corr_rej s
                                  WHERE s.sid = t.id)""")
    }
    assert(e2b.getMessage.contains("always-true") ||
      e2b.getMessage.contains("unsupported correlated subquery shape"),
      e2b.getMessage)
    // two correlated sites in one statement
    val e3 = intercept[Exception] {
      spark.sql(s"""UPDATE vtx.`$dir` t
                    SET v = (SELECT score FROM corr_rej s WHERE s.sid = t.id)
                    WHERE EXISTS (SELECT 1 FROM corr_rej s2 WHERE s2.sid = t.id)""")
    }
    assert(e3.getMessage.contains("one correlated subquery"), e3.getMessage)
  }

  test("both tiers: correlated EXISTS DELETE under deletion vectors") {
    import spark.implicits._
    val s2 = spark.newSession()
    graft.plans.RewriteVortexDml.install(s2)
    s2.conf.set("spark.sql.catalog.vtx", "graft.sources.vortex.VortexCatalog")
    s2.conf.set("spark.graft.vortex.deletionVectors", "true")
    val dir = tmp()
    (0L until 100L).map(i => (i, i * 2)).toDF("id", "v")
      .repartition(4).write.format("vortex").mode("overwrite").save(dir)
    // temp views are per-session: register on s2, not the shared spark
    s2.createDataFrame(Seq(Tuple1(1L), Tuple1(2L), Tuple1(3L)))
      .toDF("bad").createOrReplaceTempView("corr_dv_bad")
    s2.sql(s"""DELETE FROM vtx.`$dir` t
               WHERE EXISTS (SELECT 1 FROM corr_dv_bad b WHERE b.bad = t.id)""")
    assert(s2.read.format("vortex").load(dir).count() == 97L)
  }
}
