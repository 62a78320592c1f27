package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.vortex.{NestedProject, StructCodec}
import org.apache.spark.sql.types._

/** Shredded struct pages (StructCodec / EncStruct) + nested-field
  * pruning: a read touching only `meta.mime` must decode ONLY the mime
  * sub-page — sibling children (e.g. a fat blob inside the struct) are
  * skipped, never decompressed, never allocated. */
class VortexNestedPruningSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("vortex_nested_prune").toString

  /** multimodal-metadata shape: id + struct(mime, w, h, tags array,
    * inner struct) with null structs and null children sprinkled in */
  private def writeDs(dir: String): Unit = {
    import spark.implicits._
    val df = spark.range(0, 2000).select(
      col("id"),
      when(col("id") % 7 =!= 0, struct(
        concat(lit("type/"), (col("id") % 5).cast("string")).as("mime"),
        when(col("id") % 3 =!= 0, col("id") * 10).as("w"),
        (col("id") % 1000).cast("int").as("h"),
        array(col("id").cast("string"), lit("t")).as("tags"),
        struct((col("id") % 2).as("a"), (col("id") % 9).as("b")).as("inner")
      )).as("meta"),
      col("id").cast("string").as("payload"))
    df.repartition(2).write.format("vortex").mode("overwrite").save(dir)
  }

  test("full struct round-trip through shredded pages (row + columnar paths)") {
    val dir = tmp()
    writeDs(dir)
    val back = spark.read.format("vortex").load(dir)
    // force the full struct through both value assembly and fill
    val got = back.select("id", "meta", "payload").orderBy("id").collect()
    assert(got.length == 2000)
    got.foreach { r =>
      val id = r.getLong(0)
      if (id % 7 == 0) assert(r.isNullAt(1), s"id $id")
      else {
        val m = r.getStruct(1)
        assert(m.getString(0) == s"type/${id % 5}")
        if (id % 3 == 0) assert(m.isNullAt(1)) else assert(m.getLong(1) == id * 10)
        assert(m.getInt(2) == (id % 1000).toInt)
        assert(m.getSeq[String](3) == Seq(id.toString, "t"))
        val inner = m.getStruct(4)
        assert(inner.getLong(0) == id % 2 && inner.getLong(1) == id % 9)
      }
    }
  }

  test("meta.mime-only read skips sibling sub-pages") {
    val dir = tmp()
    writeDs(dir)
    val d0 = StructCodec.childDecodes.get(); val s0 = StructCodec.childSkips.get()
    val rows = spark.read.format("vortex").load(dir)
      .select(col("meta.mime").as("mime")).where(col("mime").isNotNull)
      .groupBy("mime").count().orderBy("mime").collect()
    val dN = StructCodec.childDecodes.get() - d0
    val sN = StructCodec.childSkips.get() - s0
    assert(rows.length == 5)
    assert(rows.map(_.getLong(1)).sum == 2000L - 2000L / 7 - 1)
    // 5 children stored; only mime decoded → per struct page 1 decode,
    // 4 skips
    assert(dN > 0 && sN == 4 * dN, s"decodes=$dN skips=$sN")
  }

  test("deeper pruning below a shredded child projects the blob (meta.inner.a)") {
    val dir = tmp()
    writeDs(dir)
    import spark.implicits._
    val got = spark.read.format("vortex").load(dir)
      .select(col("id"), col("meta.inner.a").as("a"))
      .where(col("a").isNotNull).orderBy("id")
      .as[(Long, Long)].collect()
    assert(got.length == 2000 - 2000 / 7 - 1)
    got.foreach { case (id, a) => assert(a == id % 2, s"id $id") }
  }

  test("legacy blob struct pages read fine — including under pruning (projection)") {
    // emulate a pre-shred file page: encode the struct column as the
    // blob layout and decode it with a PRUNED required field
    import graft.sources.vortex.{ColVec, NestedCodec, PageCodec, VortexFileReader, VortexFormat}
    val st = StructType(Seq(
      StructField("mime", StringType), StructField("w", LongType)))
    val rows = (0 until 50).map { i =>
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString(s"m$i"), i.toLong))
    }
    val bins = rows.map(r => NestedCodec.serialize(r, st)).toArray
    val vec = new ColVec(50, new Array[Boolean](50), null, bins)
    val enc = PageCodec.encode(vec, st)
    assert(enc.encoding != VortexFormat.EncStruct) // genuinely the blob layout
    val pruned = StructType(Seq(StructField("w", LongType)))
    val dec = VortexFileReader.decodeColumn(enc.bytes,
      graft.sources.vortex.VortexFormat.ColumnChunkMeta(0L, enc.bytes.length,
        enc.encoding, enc.compressed, enc.nullCount, enc.min, enc.max),
      50, StructField("meta", st), StructField("meta", pruned))
    (0 until 50).foreach { i =>
      val v = VortexFileReader.value(dec, i, pruned)
        .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      assert(v.numFields == 1 && v.getLong(0) == i.toLong)
    }
  }

  test("NestedProject projects arrays/maps/structs recursively") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val from = ArrayType(StructType(Seq(
      StructField("x", LongType), StructField("y", StringType))))
    val to = ArrayType(StructType(Seq(StructField("y", StringType))))
    val arr = new GenericArrayData(Array[Any](
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](1L, org.apache.spark.unsafe.types.UTF8String.fromString("a"))),
      null))
    val out = NestedProject.project(arr, from, to)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(out.numElements() == 2)
    assert(out.getStruct(0, 1).getUTF8String(0).toString == "a")
    assert(out.isNullAt(1))
  }
}
