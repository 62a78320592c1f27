package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.vortex.VortexFileReader

/** Guards around commit-manifest trust (round-5 hardening):
  *
  *  - chunk stats are accepted only when the ENTRY's own manifest
  *    recorded a schema matching the table's — a root can hold
  *    manifests written against different schemas (manually merged
  *    datasets), and a shared per-root verdict would let drifted files
  *    skip the footer drift guard and decode garbage;
  *  - round-3 bare-array manifests (file-level stats, no schema) are
  *    never trusted for pruning — their files keep the footer drift
  *    guard;
  *  - grouped aggregate pushdown groups by the TYPED partition value,
  *    so externally-written spellings of the same value ('g=1' vs
  *    'g=01' under LongType) merge instead of duplicating groups;
  *  - a poisoned/overflowing manifest SUM bails to the normal scan at
  *    plan time instead of crashing the optimizer.
  */
class VortexManifestGuardsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private def copyDataFiles(from: String, to: String): Unit = {
    val dst = Paths.get(to)
    Files.createDirectories(dst)
    new java.io.File(from).listFiles.filter(_.getName.endsWith(".vortex")).foreach { f =>
      Files.copy(f.toPath, dst.resolve(f.getName), StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** visible manifest JSONs only (the local FS also keeps hidden .crc
    * checksum twins, which must not be parsed) */
  private def manifestJsons(dir: String): Seq[java.io.File] =
    new java.io.File(dir, "_manifests").listFiles.toSeq
      .filter(f => f.getName.endsWith(".json") && !f.getName.startsWith("."))

  /** rewrite a manifest in place, dropping the stale Hadoop checksum
    * twin (a mismatched .crc would fail the read and be treated as a
    * torn manifest, silently disabling what the test asserts) */
  private def rewrite(f: java.io.File, bytes: Array[Byte]): Unit = {
    Files.write(f.toPath, bytes)
    val crc = new java.io.File(f.getParentFile, s".${f.getName}.crc")
    if (crc.exists) crc.delete()
  }

  private def driftInChain(t: Throwable): Boolean = {
    var cur = t
    while (cur != null) {
      if (cur.getClass.getSimpleName.contains("SchemaDrift") ||
          Option(cur.getMessage).exists(_.contains("schema drift"))) return true
      cur = cur.getCause
    }
    false
  }

  test("mixed-schema manifests in one root: drifted files hit the footer drift guard") {
    val root = Files.createTempDirectory("vortex_mixed_manifest_").toString
    val other = Files.createTempDirectory("vortex_mixed_other_").toString
    // two datasets, same column NAME, different types — each commit
    // writes its own manifest recording its own schema
    spark.range(0, 1000).select(col("id")).coalesce(1)
      .write.format("vortex").mode("overwrite").save(root)
    spark.range(0, 500).select(col("id").cast("double").as("id")).coalesce(1)
      .write.format("vortex").mode("overwrite").save(other)
    // merge: data file AND manifest from `other` land in `root` (the
    // manually-merged-datasets scenario)
    copyDataFiles(other, root)
    val mDst = Paths.get(root, "_manifests")
    new java.io.File(other, "_manifests").listFiles.foreach { f =>
      Files.copy(f.toPath, mDst.resolve("merged-" + f.getName), StandardCopyOption.REPLACE_EXISTING)
    }
    graft.sources.vortex.VortexFileReader.clearFooterCache()
    // whichever manifest seeds inference, the OTHER one's entries must
    // NOT serve chunk stats: they fall to the footer path, which
    // throws schema drift — never silent garbage (double bits as longs)
    val e = intercept[Throwable] {
      spark.read.format("vortex").load(root).collect()
    }
    assert(driftInChain(e), s"expected schema-drift failure, got: $e")
  }

  test("schema-less (round-3) manifest entries are never trusted for pruning") {
    // a bare-array manifest records name-matched min/max BYTES but no
    // schema; min/max are raw storage bytes whose interpretation
    // depends on the column type, so using them under the TABLE's
    // inferred type would silently mis-prune (or crash planning) if
    // the file had drifted. Entries without a recorded schema
    // therefore get no pruning at all: their files pay one footer
    // fetch, which keeps the loud schema-drift guard.
    val dir = Files.createTempDirectory("vortex_bare_manifest_").toString
    spark.range(0, 40000).select(col("id"))
      .repartitionByRange(4, col("id"))
      .write.format("vortex").mode("overwrite").save(dir)
    // rewrite the round-4 envelope manifest as a round-3 bare array:
    // keep file-level cols stats, drop the schema + chunk stats
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    manifestJsons(dir).foreach { f =>
      val node = mapper.readTree(f)
      val files = node.get("files").asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode]
      val it = files.elements()
      while (it.hasNext) it.next().asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        .remove("chunks")
      rewrite(f, mapper.writeValueAsBytes(files))
    }
    VortexFileReader.clearFooterCache()
    val before = VortexFileReader.footerFetches.get()
    val cnt = spark.read.format("vortex").load(dir).filter(col("id") < 5000).count()
    assert(cnt == 5000)
    val delta = VortexFileReader.footerFetches.get() - before
    assert(delta >= 4,
      s"schema-less entries must not prune: every data file's footer is consulted, got $delta")
  }

  test("grouped stats pushdown merges distinct path spellings of one typed value") {
    val a = Files.createTempDirectory("vortex_spell_a_").toString
    val b = Files.createTempDirectory("vortex_spell_b_").toString
    spark.range(0, 100).select(col("id")).coalesce(1)
      .write.format("vortex").mode("overwrite").save(a)
    spark.range(100, 150).select(col("id")).coalesce(1)
      .write.format("vortex").mode("overwrite").save(b)
    // externally-assembled Hive layout: 'g=1' and 'g=01' both parse to
    // LongType value 1 under partition inference
    val root = Files.createTempDirectory("vortex_spell_root_").toString
    copyDataFiles(a, s"$root/g=1")
    copyDataFiles(b, s"$root/g=01")
    // count/min keep the metadata pushdown ENGAGED (a SUM would bail
    // it here — no manifest sums exist for hand-assembled layouts —
    // and the normal scan merges typed values anyway, hiding the bug)
    val out = spark.read.format("vortex").load(root)
      .groupBy("g").agg(count(lit(1)).as("n"), min(col("id")).as("mn"))
      .collect()
    assert(out.length == 1, s"expected ONE merged group for g=1, got ${out.toSeq}")
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 150L && out(0).getLong(2) == 0L)
  }

  test("overflowing manifest SUM bails to the normal scan instead of crashing planning") {
    val dir = Files.createTempDirectory("vortex_sum_poison_").toString
    spark.range(1, 10).select(col("id").cast("decimal(1,0)").as("d"))
      .coalesce(1).write.format("vortex").mode("overwrite").save(dir)
    val expected = spark.read.format("vortex").load(dir)
      .agg(sum(col("d")).cast("long")).collect()(0).getLong(0)
    // poison the writer-exact sum: an unscaled total whose DECIMAL(11,0)
    // result representation overflows (simulates a 1e12-row dataset of
    // single-digit decimals, where the exact total exceeds p+10 digits)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    manifestJsons(dir).foreach { f =>
      val node = mapper.readTree(f)
      val files = node.get("files")
      val it = files.elements()
      while (it.hasNext) {
        val cit = it.next().get("cols").elements()
        while (cit.hasNext) {
          val c = cit.next().asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          if (c.get("name").asText() == "d") c.put("sum", 999999999999999999L)
        }
      }
      rewrite(f, mapper.writeValueAsBytes(node))
    }
    val got = spark.read.format("vortex").load(dir)
      .agg(sum(col("d")).cast("long")).collect()(0).getLong(0)
    assert(got == expected, s"poisoned manifest sum must fall back to the scan: $got != $expected")
  }
}
