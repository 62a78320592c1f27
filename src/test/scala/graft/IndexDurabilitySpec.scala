package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VecFixedPoint
import graft.queries.SimilarityOps
import graft.queries.SimilarityOps.QVec

/** Stored-index durability across code versions (VERDICT r13 next #8):
  * the r13 quantize fast path changed `VecFixedPoint.quantizeOne`'s
  * hot path, and STORED int8/IVF index files written by the pre-r13
  * (pure-BigDecimal) implementation must remain probe-able bit-exact.
  * Three pins:
  *  1. the fast path is value-identical to the legacy BigDecimal
  *     HALF_UP quantizer over an adversarial float population
  *     (ties, near-ties, denormals, negatives, overflow-scale);
  *  2. an index WRITTEN with legacy-quantized vectors (a pre-r13
  *     fixture, reconstructed exactly — the legacy path is still in
  *     the code as `quantizeSlow`'s formula) is byte-identical to a
  *     current-code index over the same floats, appends leave its
  *     standing files untouched, and probes return identical rows;
  *  3. a GOLDEN content hash of the stored rows for a fixed input,
  *     pinned as a literal — any future change to quantization or the
  *     stored schema that would orphan standing indexes fails here
  *     first. */
class IndexDurabilitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  /** the PRE-r13 quantizer, verbatim: BigDecimal HALF_UP at scale 8 */
  private def legacyQuantizeOne(x: Float): Long =
    java.math.BigDecimal.valueOf(x.toDouble)
      .setScale(8, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  test("quantizeOne == the legacy BigDecimal HALF_UP quantizer (adversarial floats)") {
    val rng = new scala.util.Random(140)
    val adversarial = Seq(0.0f, -0.0f, 1.0f, -1.0f, 0.5f, -0.5f,
      1e-8f, -1e-8f, 5e-9f, 1.5e-8f, 2.5e-8f,       // half-ulp ties at scale 8
      0.123456785f, -0.123456785f,                   // tie digits
      9.999999f, -9.999999f, 10.000001f,             // near the 1e9 fast gate
      Float.MinPositiveValue, -Float.MinPositiveValue,
      3.4e2f, -3.4e2f)
    val random = (0 until 200000).map { _ =>
      rng.nextInt(4) match {
        case 0 => (rng.nextFloat() - 0.5f) * 2f          // unit range
        case 1 => (rng.nextFloat() - 0.5f) * 2000f       // large
        case 2 => (rng.nextFloat() - 0.5f) * 2e-6f       // tiny
        case _ =>                                        // exact tie shapes
          (rng.nextInt(2000000) - 1000000).toFloat / 2e8f
      }
    }
    (adversarial ++ random).foreach { x =>
      assert(VecFixedPoint.quantizeOne(x) == legacyQuantizeOne(x),
        s"quantize divergence at x=$x (bits=${java.lang.Float.floatToRawIntBits(x)})")
    }
  }

  // deterministic synthetic corpus: 240 vectors of dim 64 (the
  // embedding dim the centroid accumulator is laid out for)
  private def floats(seed: Int, n: Int): Seq[(Long, Array[Float])] = {
    val rng = new scala.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong, Array.fill(64)((rng.nextFloat() - 0.5f) * 2f)))
  }

  private def qvecOf(id: Long, f: Array[Float],
                     q1: Float => Long): QVec = {
    val q = f.map(q1)
    QVec(id, 0, q, VecFixedPoint.dot(q, q))
  }

  private def walkBytes(dir: String): Map[String, String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().sortBy(_.getName).toSeq.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(dir)).filter(_.getName.endsWith(".vortex")).map { f =>
      val b = java.nio.file.Files.readAllBytes(f.toPath)
      val md5 = java.security.MessageDigest.getInstance("MD5").digest(b)
      f.getAbsolutePath.stripPrefix(dir) -> md5.map("%02x".format(_)).mkString
    }.toMap
  }

  /** logical content hash: every stored row, canonical order */
  private def contentHash(dir: String): String = {
    import org.apache.spark.sql.functions._
    val rows = spark.read.format("vortex").load(dir)
      .select(col("id"), col("k").cast("long"), col("q"), col("saa"))
      .collect()
      .map(r => s"${r.getLong(0)}|${r.getLong(1)}|" +
        s"${r.getSeq[Long](2).mkString(",")}|${r.getLong(3)}")
      .sorted.mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(rows.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("a pre-r13 (legacy-quantized) stored IVF index is byte-identical and stays probe-able") {
    import spark.implicits._
    val base = floats(14, 240)
    val legacyDir = java.nio.file.Files.createTempDirectory("ivf_legacy").toString
    val currentDir = java.nio.file.Files.createTempDirectory("ivf_current").toString
    // the pre-r13 fixture: an index written from legacy-quantized vectors
    SimilarityOps.buildIvfIndex(spark,
      base.map { case (id, f) => qvecOf(id, f, legacyQuantizeOne) }.toDS(),
      legacyDir, K = 4, refinements = 2)
    // the same corpus through the CURRENT quantizer
    SimilarityOps.buildIvfIndex(spark,
      base.map { case (id, f) => qvecOf(id, f, VecFixedPoint.quantizeOne) }.toDS(),
      currentDir, K = 4, refinements = 2)
    // stored files are BYTE-identical (same relative layout, same md5)
    val lb = walkBytes(legacyDir); val cb = walkBytes(currentDir)
    assert(lb.keySet.map(_.replaceAll("part-[^/]*$", "")) ==
      cb.keySet.map(_.replaceAll("part-[^/]*$", "")), "same partition layout")
    assert(lb.values.toSeq.sorted == cb.values.toSeq.sorted,
      "legacy-quantized and current-quantized index files are byte-identical")
    // an append with CURRENT code leaves the legacy fixture's standing
    // files untouched (IndexAppendSpec's contract, re-proven against
    // the pre-r13 fixture)
    val before = walkBytes(legacyDir)
    val batch = floats(15, 40).map { case (id, f) =>
      qvecOf(id + 1000L, f, VecFixedPoint.quantizeOne) }
    SimilarityOps.appendIvfIndex(spark, batch.toDS(), legacyDir)
    val after = walkBytes(legacyDir)
    before.foreach { case (rel, h) =>
      assert(after.get(rel).contains(h), s"standing file $rel changed by append") }
    assert(after.size > before.size, "append added files")
    // probes over the appended legacy fixture equal probes over a
    // from-scratch CURRENT index of the identical corpus
    SimilarityOps.appendIvfIndex(spark, batch.toDS(), currentDir)
    val queries = floats(16, 12).map { case (id, f) =>
      qvecOf(id + 5000L, f, VecFixedPoint.quantizeOne) }
    val pl = SimilarityOps.probeIvfIndex(spark, queries.toDS(), legacyDir, 5)
      .collect().map(_.toString).sorted
    val pc = SimilarityOps.probeIvfIndex(spark, queries.toDS(), currentDir, 5)
      .collect().map(_.toString).sorted
    assert(pl.sameElements(pc), "probe rows identical on the pre-r13 fixture")
    assert(pl.nonEmpty)
  }

  test("golden content hash of the stored index for a fixed input (version drift tripwire)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivf_golden").toString
    SimilarityOps.buildIvfIndex(spark,
      floats(14, 240).map { case (id, f) =>
        qvecOf(id, f, VecFixedPoint.quantizeOne) }.toDS(),
      dir, K = 4, refinements = 2)
    // pinned r14: any change to quantization, k-means seeding, or the
    // stored (id, k, q, saa) schema that would orphan standing indexes
    // trips this first. If the change is INTENTIONAL, re-pin the hash
    // and write the migration note in FORMAT.md.
    assert(contentHash(dir) == GoldenIndexHash,
      s"stored-index content drifted from the r14 pin — got ${contentHash(dir)}")
  }

  private val GoldenIndexHash = "d3e5622b71dc93ffcde5cddb142324b0"
}
