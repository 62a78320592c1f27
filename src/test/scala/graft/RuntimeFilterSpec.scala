package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.vortex._

class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  test("runtime filters tighten partition planning after scan construction") {
    val dir = Files.createTempDirectory("vortex_rt_").toString
    spark.range(0, 10000).selectExpr("id", "CAST(id % 4 AS BIGINT) AS bucket")
      .write.format("vortex").option("partitionBy", "bucket").mode("append").save(dir)
    val schema = spark.read.format("vortex").load(dir).schema
    val scan = new VortexScan(schema, schema, Array.empty, Seq(dir))
    val before = scan.planInputPartitions().length
    // simulate a DPP-style runtime filter arriving from a joined dim
    scan.filter(Array[org.apache.spark.sql.sources.Filter](org.apache.spark.sql.sources.In("bucket", Array(1L))))
    val after = scan.planInputPartitions()
    assert(after.length < before)
    assert(after.forall(_.asInstanceOf[VortexInputPartition].file.contains("bucket=1")))
    // stats shrink accordingly
    val st = scan.estimateStatistics()
    assert(st.numRows().getAsLong == 2500L)
  }

  test("streaming offset JSON round trip incl. escaping") {
    val files = Seq("/a/b/part-1.vortex", "/weird \"name\"/x.vortex")
    val o = VortexOffset(1723450000123L, files)
    val back = VortexOffset.fromJson(o.json())
    assert(back.maxMtime == o.maxMtime && back.atMax == files && back.legacyAll.isEmpty)
    assert(VortexOffset.fromJson(VortexOffset.Empty.json()) == VortexOffset.Empty)
  }

  test("legacy full-set offsets still deserialize (checkpoint compat)") {
    val legacy = """["/a/b/part-1.vortex", "/weird \"name\"\/x.vortex"]"""
      .replace("\\/", "/")
    val o = VortexOffset.fromJson(legacy)
    assert(o.legacyAll.isDefined)
    assert(o.seen("/a/b/part-1.vortex", 123L))
    assert(!o.seen("/new/file.vortex", 123L))
    // compacted semantics: seen = strictly-older mtime or listed at tick
    val c = VortexOffset(1000L, Seq("/tie.vortex"))
    assert(c.seen("/old.vortex", 999L))
    assert(c.seen("/tie.vortex", 1000L))
    assert(!c.seen("/other-tie.vortex", 1000L))
    assert(!c.seen("/new.vortex", 1001L))
  }
}
