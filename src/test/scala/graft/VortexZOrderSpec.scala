package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{ZValue, ZValueUtil}
import graft.sources.vortex.{VortexFileReader, VortexZOrder}

/** Z-order clustered writes: multi-dimensional zone-map pruning from
  * the existing chunk min/max tier — the layout, not the reader, is
  * what changes. */
class VortexZOrderSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  test("z_value: codegen output matches the reference interleave, orders correctly") {
    ZValue.register(spark)
    val rows = spark.range(0, 512)
      .select(expr("cast(id % 16 as int)").as("x"), expr("cast(id / 16 as int)").as("y"))
      .select(col("x"), col("y"), expr("z_value(x, y)").as("z"))
      .collect()
    rows.foreach { r =>
      val expect = ZValueUtil.interleave(Array(
        ZValueUtil.ordLong(r.getInt(0).toLong), ZValueUtil.ordLong(r.getInt(1).toLong)))
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]]("z"), expect),
        s"codegen/reference mismatch at (${r.getInt(0)}, ${r.getInt(1)})")
    }
    // lexicographic order of the key == Morton order of the points
    def leq(a: Array[Byte], b: Array[Byte]): Boolean = {
      var i = 0
      while (i < a.length) {
        val c = java.lang.Integer.compare(a(i) & 0xff, b(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      true
    }
    val z00 = ZValueUtil.interleave(Array(ZValueUtil.ordLong(0), ZValueUtil.ordLong(0)))
    val z11 = ZValueUtil.interleave(Array(ZValueUtil.ordLong(1), ZValueUtil.ordLong(1)))
    val zneg = ZValueUtil.interleave(Array(ZValueUtil.ordLong(-1), ZValueUtil.ordLong(0)))
    assert(leq(z00, z11) && leq(zneg, z00), "sign-flipped order broken")
    // mixed types accepted; wrong arity rejected at analysis
    assert(spark.range(1).select(expr("z_value(cast(id as double), 's', id)")).count() == 1)
    intercept[Exception] { spark.range(1).select(expr("z_value(id)")).collect() }
  }

  test("z-ordered layout prunes the non-leading dimension; linear layout cannot") {
    // 256×256 grid; 4096-row chunks → linear-by-x chunks span ALL of y,
    // z-ordered chunks are 64×64 tiles spanning 1/4 of y
    val grid = spark.range(0, 65536)
      .select(expr("cast(id % 256 as int)").as("x"),
              expr("cast(id div 256 as int)").as("y"),
              col("id").as("payload"))
    val linDir = Files.createTempDirectory("vortex_lin_").toString
    val zDir = Files.createTempDirectory("vortex_z_").toString
    grid.repartition(1).sortWithinPartitions("x")
      .write.format("vortex").option("chunkRows", "4096").mode("overwrite").save(linDir)
    VortexZOrder.writeZOrdered(grid, Seq("x", "y"), zDir,
      numFiles = 1, options = Map("chunkRows" -> "4096"))

    def decodesFor(dir: String): Long = {
      val before = VortexFileReader.pageDecodes.get()
      val n = spark.read.format("vortex").load(dir)
        .filter(col("y") >= 16 && col("y") < 32).agg(sum("payload")).head().getLong(0)
      // correctness first: 16 full x-rows of the grid
      val lo = 16L * 256; val hi = 32L * 256
      assert(n == (lo until hi).map(i => i).sum, s"wrong sum for $dir")
      VortexFileReader.pageDecodes.get() - before
    }
    val linDecodes = decodesFor(linDir)
    val zDecodes = decodesFor(zDir)
    // linear: every chunk's y range is 0..255 → nothing prunes.
    // z-order: only the y∈[0,63] tile row intersects → ≤ 1/4 survives
    assert(zDecodes * 2 < linDecodes,
      s"z-order should prune chunks the linear layout cannot ($zDecodes vs $linDecodes)")
  }

  test("z-order composes with manifest blooms on a third column") {
    val dir = Files.createTempDirectory("vortex_zb_").toString
    val df = spark.range(0, 20000)
      .select(expr("cast(id % 100 as int)").as("x"),
              expr("cast(id div 100 as int)").as("y"),
              expr("concat('k', xxhash64(id))").as("key"))
    VortexZOrder.writeZOrdered(df, Seq("x", "y"), dir,
      numFiles = 4, options = Map("bloomFilters" -> "key"))
    val reads = spark.read.format("vortex").load(dir)
    val before = VortexFileReader.pageDecodes.get()
    assert(reads.filter(col("key") === "k-nothing").count() == 0)
    assert(VortexFileReader.pageDecodes.get() == before, "bloom must prune all files")
    val someKey = reads.select("key").head().getString(0)
    assert(reads.filter(col("key") === someKey).count() >= 1)
  }
}
