package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.vortex.VortexSchemaDriftException

/** Schema evolution on read (`.option("mergeSchema", "true")`): a
  * 100 TB dataset accumulates added/dropped columns; evolution reads
  * the by-name union, null-fills missing columns per file, and keeps
  * the loud drift guard for same-name/different-type — while the
  * DEFAULT read stays strict (any drift throws). */
class VortexEvolutionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private def tmp(): String = Files.createTempDirectory("vortex_evo_").toString

  /** copy dir b's data files into dir a (manifests untouched: the
    * copied files are manifest-uncovered, like any out-of-band add) */
  private def mixIn(a: String, b: String): Unit =
    new java.io.File(b).listFiles.filter(_.getName.endsWith(".vortex")).foreach { f =>
      Files.copy(f.toPath, Paths.get(a, "evo_" + f.getName), StandardCopyOption.REPLACE_EXISTING)
    }

  /** v1 files (a, b) + v2 files (a, b, c) in one directory */
  private def evolvedDir(): String = {
    val dir = tmp()
    val v2 = tmp()
    spark.range(0, 100).selectExpr("id AS a", "CAST(id * 2 AS INT) AS b")
      .coalesce(1).write.format("vortex").mode("overwrite").save(dir)
    spark.range(100, 150)
      .selectExpr("id AS a", "CAST(id * 2 AS INT) AS b", "concat('v2_', id) AS c")
      .coalesce(1).write.format("vortex").mode("overwrite").save(v2)
    mixIn(dir, v2)
    dir
  }

  test("default read stays strict: mixed schemas throw the drift error") {
    val dir = evolvedDir()
    val e = intercept[Exception] {
      spark.read.format("vortex").load(dir).count()
    }
    def drift(t: Throwable): Boolean =
      t != null && (t.isInstanceOf[VortexSchemaDriftException] || drift(t.getCause))
    assert(drift(e), s"expected drift failure, got $e")
  }

  test("mergeSchema reads the union; missing columns are null per file") {
    val dir = evolvedDir()
    val df = spark.read.format("vortex").option("mergeSchema", "true").load(dir)
    assert(df.columns.toSeq == Seq("a", "b", "c"))
    assert(df.count() == 150)
    // v1 rows surface c as NULL; v2 rows carry their values
    assert(df.filter(col("c").isNull).count() == 100)
    assert(df.filter(col("a") >= 100).filter(col("c") === concat(lit("v2_"), col("a"))).count() == 50)
    // aggregates over the shared columns see every file
    assert(df.agg(sum("a")).collect()(0).getLong(0) == (0L until 150L).sum)
  }

  test("projection of only the added column over old files yields nulls") {
    val dir = evolvedDir()
    val df = spark.read.format("vortex").option("mergeSchema", "true").load(dir)
    val vals = df.select("c").collect().map(r => Option(r.getString(0)))
    assert(vals.count(_.isEmpty) == 100 && vals.count(_.isDefined) == 50)
  }

  test("filters on shared columns still prune and return exact results") {
    val dir = evolvedDir()
    val df = spark.read.format("vortex").option("mergeSchema", "true").load(dir)
    assert(df.filter(col("a") < 10).count() == 10)
    assert(df.filter(col("a") >= 140).count() == 10)
    // filter on the evolved column: old files contribute nothing
    assert(df.filter(col("c").isNotNull && col("a") < 120).count() == 20)
  }

  test("same-name different-type stays a loud error even under mergeSchema") {
    val dir = tmp()
    val bad = tmp()
    spark.range(0, 10).selectExpr("id AS a").coalesce(1)
      .write.format("vortex").mode("overwrite").save(dir)
    spark.range(0, 10).selectExpr("CAST(id AS STRING) AS a").coalesce(1)
      .write.format("vortex").mode("overwrite").save(bad)
    mixIn(dir, bad)
    val e = intercept[Exception] {
      spark.read.format("vortex").option("mergeSchema", "true").load(dir).count()
    }
    def drift(t: Throwable): Boolean =
      t != null && (t.isInstanceOf[VortexSchemaDriftException] || drift(t.getCause))
    assert(drift(e), s"expected retype to fail loudly, got $e")
  }

  test("compaction groups by schema version: evolved dirs compact and stay readable") {
    val dir = tmp()
    val v2 = tmp()
    // many small files of each version in ONE directory
    spark.range(0, 1000).selectExpr("id AS a", "CAST(id * 2 AS INT) AS b")
      .repartition(4).write.format("vortex").mode("overwrite").save(dir)
    spark.range(1000, 1500)
      .selectExpr("id AS a", "CAST(id * 2 AS INT) AS b", "concat('v2_', id) AS c")
      .repartition(3).write.format("vortex").mode("overwrite").save(v2)
    mixIn(dir, v2)
    val before = new java.io.File(dir).listFiles.count(_.getName.endsWith(".vortex"))
    val res = graft.sources.vortex.VortexMaintenance.compact(spark, dir)
    assert(res.filesAbsorbed == before,
      s"both schema versions must compact (absorbed ${res.filesAbsorbed} of $before)")
    assert(res.batches == 2, "one output file per schema version")
    val df = spark.read.format("vortex").option("mergeSchema", "true").load(dir)
    assert(df.count() == 1500)
    assert(df.filter(col("c").isNull).count() == 1000)
    assert(df.agg(sum("a")).collect()(0).getLong(0) == (0L until 1500L).sum)
  }

  test("mixed timestamp-unit vintages never mis-prune (manifest trust is unit-aware)") {
    // two vintages agree on (name, type) but store ts in different
    // units (ms vs µs). Manifest stats are storage-domain, so trusting
    // the other vintage's entries under the table's unit would convert
    // a filter constant with the wrong scale and silently prune every
    // chunk of those files. Unit-mismatched entries must fall to the
    // footer path (file-faithful pruning + decode).
    val dir = tmp()
    val v2 = tmp()
    def rows(lo: Int, hi: Int) = spark.range(lo, hi).selectExpr(
      "id AS a", "timestamp_micros(CAST(id * 86400000000 AS LONG)) AS ts")
    rows(0, 500).coalesce(1).write.format("vortex")
      .option("timestampUnits", "ts=ms").mode("overwrite").save(dir)
    rows(500, 1000).coalesce(1).write.format("vortex").mode("overwrite").save(v2)
    // mix in BOTH the data files (ORIGINAL names, so the copied
    // manifest's relPaths resolve) and their manifests: the foreign
    // vintage must be manifest-COVERED — the trust path under test
    new java.io.File(v2).listFiles.filter(_.getName.endsWith(".vortex")).foreach { f =>
      Files.copy(f.toPath, Paths.get(dir, f.getName), StandardCopyOption.REPLACE_EXISTING)
    }
    new java.io.File(v2, "_manifests").listFiles
      .filter(f => f.getName.endsWith(".json") && !f.getName.startsWith("."))
      .foreach { f =>
        Files.copy(f.toPath, Paths.get(dir, "_manifests", f.getName),
          StandardCopyOption.REPLACE_EXISTING)
      }
    val df = spark.read.format("vortex").load(dir)
    // cut inside each vintage's range: exact counts prove no vintage
    // was mis-pruned in either direction
    assert(df.filter(col("ts") >= lit("1970-09-01").cast("timestamp")).count() ==
      1000 - 243)
    assert(df.filter(col("ts") >= lit("1972-01-01").cast("timestamp")).count() ==
      1000 - 730)
    assert(df.count() == 1000)
    assert(df.agg(min("ts"), max("ts")).collect()(0).toString.nonEmpty)
  }

  test("evolved datasets decline stats pushdown but answer correctly") {
    val dir = evolvedDir()
    val df = spark.read.format("vortex").option("mergeSchema", "true").load(dir)
    val row = df.agg(count(lit(1)), min("a"), max("a"), count("c")).collect()(0)
    assert(row.getLong(0) == 150 && row.getLong(1) == 0 && row.getLong(2) == 149
      && row.getLong(3) == 50)
  }

  test("an unreadable footer fails mergeSchema inference loudly") {
    val dir = evolvedDir()
    // truncate the mixed-in (manifest-uncovered) v2 file: silently
    // dropping its columns would make `c` vanish from results instead
    // of failing the job — the round-6 advice fix under test
    val f = new java.io.File(dir).listFiles
      .filter(x => x.getName.startsWith("evo_") && x.getName.endsWith(".vortex")).head
    val ch = java.nio.channels.FileChannel.open(f.toPath,
      java.nio.file.StandardOpenOption.WRITE)
    try ch.truncate(10) finally ch.close()
    val e = intercept[Exception] {
      spark.read.format("vortex").option("mergeSchema", "true").load(dir).count()
    }
    def loud(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("cannot read footer")) ||
        loud(t.getCause))
    assert(loud(e), s"expected the loud footer-failure, got $e")
  }
}
