package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.vortex.{ColVec, FsstCodec, PageCodec, VortexFormat}
import org.apache.spark.sql.types.StringType

/** FSST-role string tier (SURVEY.md §2.9): symbol-table round trip,
  * selection-never-regresses, and the size criterion — a text-heavy
  * table's vortex files must not exceed the same data as parquet.
  */
class FsstCodecSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private def bytes(s: String) = s.getBytes("UTF-8")

  test("fsst encode/decode round trip incl. escapes, empties, binary bytes") {
    val rnd = new scala.util.Random(7)
    val vocab = Seq("the quick brown fox", "jumps over", "lazy dog", "compression",
      "substring symbol table", "aaaaaaaa", "zzz")
    val vals: Array[Array[Byte]] = Array.tabulate(300) { i =>
      if (i % 37 == 0) Array.emptyByteArray
      else if (i % 23 == 0) Array.tabulate(20)(j => ((i * 31 + j * 7) % 256).toByte) // raw bytes incl. 0xFF
      else bytes(Seq.fill(3 + rnd.nextInt(5))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val syms = FsstCodec.train(vals, vals.length)
    assert(syms.nonEmpty)
    val page = FsstCodec.encode(vals, vals.length, syms)
    val back = FsstCodec.decode(
      java.nio.ByteBuffer.wrap(page).order(java.nio.ByteOrder.LITTLE_ENDIAN), vals.length)
    assert(back.length == vals.length)
    vals.indices.foreach(i => assert(java.util.Arrays.equals(back(i), vals(i)), s"row $i"))
  }

  test("PageCodec picks fsst for natural text and round-trips") {
    // natural text (real documents corpus): word-level redundancy FSST
    // exploits but long-range zstd matching alone does not beat
    val vals: Array[Array[Byte]] = Tables.t(spark, "/root/testdata/sf0.01", "documents")
      .select("text").collect().map(r => bytes(r.getString(0)))
    val vec = new ColVec(vals.length, new Array[Boolean](vals.length), null, vals.clone())
    val enc = PageCodec.encode(vec, StringType)
    assert(enc.encoding == VortexFormat.EncFsst, s"expected fsst, got ${enc.encoding}")
    val dec = PageCodec.decode(enc.bytes, enc.encoding, enc.compressed, vals.length,
      enc.nullCount, StringType)
    vals.indices.foreach(i => assert(java.util.Arrays.equals(dec.bins(i), vals(i))))
  }

  test("documents table as vortex ≤ its parquet size") {
    val sf = "/root/testdata/sf0.01"
    val dir = Files.createTempDirectory("vortex_docs_").toString
    Tables.t(spark, sf, "documents").repartition(1)
      .write.format("vortex").mode("append").save(dir)
    val vortexBytes = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".vortex")).map(_.length).sum
    val parquetBytes = new java.io.File(s"$sf/documents.parquet").length
    info(s"vortex=$vortexBytes parquet=$parquetBytes")
    assert(vortexBytes <= parquetBytes,
      s"vortex $vortexBytes > parquet $parquetBytes")
  }
}
