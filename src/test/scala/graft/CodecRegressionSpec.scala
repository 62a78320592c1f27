package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.vortex.PartitionedLayout

/** Regressions for codec/layout edge cases:
  *  - dictionary indices are unsigned (cardinality 129–256 chunks used
  *    to sign-extend byte indices and AIOOBE on read);
  *  - float/double chunks containing NaN publish no min/max stats
  *    (Spark orders NaN above +Inf, so stats-based pruning would drop
  *    matching NaN rows);
  *  - partition values percent-encode UTF-8 bytes (non-Latin-1 chars
  *    used to corrupt on round-trip).
  */
class CodecRegressionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("dictionary round-trip with >128 distinct strings (unsigned byte indices)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("vortex_dict_").toString
    // 200 distinct values × 4000 rows in one chunk → dict encoding wins
    // (dict.size*4 < n) and indices 128..199 exercise the unsigned path
    val df = spark.range(0, 4000).map(i => s"val_${i % 200}").toDF("s")
      .repartition(1)
    df.write.format("vortex").option("chunkRows", "4096").mode("overwrite").save(dir)
    val back = spark.read.format("vortex").load(dir)
    assert(back.count() == 4000)
    assert(back.distinct().count() == 200)
    val expect = (0 until 4000).map(i => s"val_${i % 200}")
    assert(back.as[String].collect().sorted.toSeq == expect.sorted)
  }

  test("NaN double chunk is not pruned by min/max stats") {
    import spark.implicits._
    val dir = Files.createTempDirectory("vortex_nan_").toString
    Seq(1.0, 2.0, Double.NaN).toDF("x").repartition(1)
      .write.format("vortex").mode("overwrite").save(dir)
    // Spark semantics: NaN > 5.0 is TRUE (NaN sorts above +Inf).
    // With NaN-blind stats (max=2.0) the chunk would be skipped and the
    // row silently lost.
    val got = spark.read.format("vortex").load(dir).filter($"x" > 5.0).collect()
    assert(got.length == 1 && got(0).getDouble(0).isNaN)
  }

  test("partition value escape round-trips non-Latin-1 strings") {
    for (s <- Seq("a,b=c/d", "€uro", "日本語", "mixé 🦑", "plain", "%41")) {
      assert(PartitionedLayout.unescape(PartitionedLayout.escape(s)) == s,
        s"round-trip failed for '$s' -> '${PartitionedLayout.escape(s)}'")
    }
  }

  test("partitionBy a non-Latin-1 string column round-trips") {
    import spark.implicits._
    val dir = Files.createTempDirectory("vortex_part_").toString
    Seq(("€uro", 1L), ("日本", 2L), ("plain", 3L)).toDF("k", "v")
      .write.format("vortex").option("partitionBy", "k").mode("overwrite").save(dir)
    val back = spark.read.format("vortex").load(dir)
    assert(back.select("k", "v").as[(String, Long)].collect().toMap ==
      Map("€uro" -> 1L, "日本" -> 2L, "plain" -> 3L))
  }
  test("delta encoding: chosen for sorted timestamps/ids, exact round trip") {
    import graft.sources.vortex.{ColVec, PageCodec, VortexFormat}
    import org.apache.spark.sql.types.LongType
    // sorted with small jitter: value range spans 36 bits, delta range ~10
    val rnd = new scala.util.Random(11)
    val n = 5000
    val vals = new Array[Long](n)
    var v = 1700000000000000L
    (0 until n).foreach { i => v += 1 + rnd.nextInt(1000); vals(i) = v }
    val vec = new ColVec(n, new Array[Boolean](n), vals.clone(), null)
    val enc = PageCodec.encode(vec, LongType)
    assert(enc.encoding == VortexFormat.EncDelta, s"expected delta, got ${enc.encoding}")
    val dec = PageCodec.decode(enc.bytes, enc.encoding, enc.compressed, n, enc.nullCount, LongType)
    assert(java.util.Arrays.equals(dec.longs, vals))
  }

  test("delta encoding: descending and mixed-sign deltas round trip") {
    import graft.sources.vortex.{ColVec, PageCodec, VortexFormat}
    import org.apache.spark.sql.types.LongType
    val vals: Array[Long] = Array.tabulate(2000)(i => 5000000000L - i.toLong * 3 + (i % 7))
    val vec = new ColVec(vals.length, new Array[Boolean](vals.length), vals.clone(), null)
    val enc = PageCodec.encode(vec, LongType)
    assert(enc.encoding == VortexFormat.EncDelta)
    val dec = PageCodec.decode(enc.bytes, enc.encoding, enc.compressed, vals.length,
      enc.nullCount, LongType)
    assert(java.util.Arrays.equals(dec.longs, vals))
  }

  test("delta-vs-FoR selection: wide random values keep FoR/plain") {
    import graft.sources.vortex.{ColVec, PageCodec, VortexFormat}
    import org.apache.spark.sql.types.LongType
    val rnd = new scala.util.Random(13)
    val vals = Array.fill(1000)(rnd.nextLong() >> 20) // wide but not overflowing deltas everywhere
    val vec = new ColVec(vals.length, new Array[Boolean](vals.length), vals.clone(), null)
    val enc = PageCodec.encode(vec, LongType)
    val dec = PageCodec.decode(enc.bytes, enc.encoding, enc.compressed, vals.length,
      enc.nullCount, LongType)
    assert(java.util.Arrays.equals(dec.longs, vals))
  }
}
