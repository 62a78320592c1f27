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
}
