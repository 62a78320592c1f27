package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.vortex.VortexFileReader

/** Scan-planning efficiency: at ~800k splits over an object store the
  * driver cannot afford per-file footer round-trips per planning round
  * — footers are fetched once per (path, len, mtime) into the per-JVM
  * cache, planning is memoized per filter set, and estimateStatistics
  * reuses the plan instead of re-planning.
  */
class VortexPlanningSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  test("footer fetched at most once per file across repeated scans + stats") {
    val dir = Files.createTempDirectory("vortex_plan_").toString
    spark.range(0, 4000).repartition(4).write.format("vortex").mode("append").save(dir)
    val nFiles = new java.io.File(dir).listFiles.count(_.getName.endsWith(".vortex"))
    assert(nFiles >= 2)
    val before = VortexFileReader.footerFetches.get()
    val df = spark.read.format("vortex").load(dir)
    // schema inference + two actions + a filtered action: planning,
    // statistics estimation, and executor-side reads all hit the cache
    assert(df.count() == 4000)
    assert(df.filter("id >= 2000").count() == 2000)
    assert(df.join(df.limit(5), "id").count() == 5)
    val delta = VortexFileReader.footerFetches.get() - before
    assert(delta <= nFiles, s"footers fetched $delta times for $nFiles files")
  }

  test("commit manifest prunes whole files before any footer fetch") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("vortex_manifest_").toString
    // 4 files with disjoint id ranges; the commit writes _manifests/
    spark.range(0, 40000).select(col("id"))
      .repartitionByRange(4, col("id"))
      .write.format("vortex").mode("append").save(dir)
    assert(new java.io.File(dir, "_manifests").listFiles.exists(_.getName.endsWith(".json")))
    VortexFileReader.clearFooterCache() // cold planning conditions
    val before = VortexFileReader.footerFetches.get()
    val cnt = spark.read.format("vortex").load(dir).filter(col("id") < 5000).count()
    assert(cnt == 5000)
    val delta = VortexFileReader.footerFetches.get() - before
    // schema inference reads one footer + the single surviving file;
    // the 3 range-excluded files must never be fetched
    assert(delta <= 2, s"manifest pruning should leave ≤2 footer fetches, got $delta")
    // staleness: overwrite flushes old manifests with the data
    spark.range(100, 200).select(col("id"))
      .write.format("vortex").mode("overwrite").save(dir)
    val back = spark.read.format("vortex").load(dir)
    assert(back.count() == 100)
    assert(back.filter(col("id") < 5000).count() == 100)
  }

  test("schema drift across files fails planning with a named error") {
    import spark.implicits._
    val a = Files.createTempDirectory("vortex_drift_a_").toString
    val b = Files.createTempDirectory("vortex_drift_b_").toString
    val mixed = Files.createTempDirectory("vortex_drift_").toString
    Seq((1L, "x"), (2L, "y")).toDF("id", "s").coalesce(1)
      .write.format("vortex").mode("overwrite").save(a)
    Seq((3L, 1.5), (4L, 2.5)).toDF("id", "d").coalesce(1)
      .write.format("vortex").mode("overwrite").save(b)
    def dataFile(dir: String) =
      new java.io.File(dir).listFiles.filter(_.getName.endsWith(".vortex")).head
    java.nio.file.Files.copy(dataFile(a).toPath,
      java.nio.file.Paths.get(mixed, "part-0-aaa.vortex"))
    java.nio.file.Files.copy(dataFile(b).toPath,
      java.nio.file.Paths.get(mixed, "part-1-bbb.vortex"))
    val e = intercept[Exception] {
      spark.read.format("vortex").load(mixed).collect()
    }
    def root(t: Throwable): Throwable = if (t.getCause == null) t else root(t.getCause)
    assert(root(e).isInstanceOf[graft.sources.vortex.VortexSchemaDriftException],
      s"expected VortexSchemaDriftException, got $e")
    assert(root(e).getMessage.contains("schema drift"))
  }
}
