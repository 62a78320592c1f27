package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.vortex.{QuantileSketch, SketchPercentile}

/** QuantileSketch invariants (the exactness claims SketchPercentile
  * relies on) + the metadata-routed exact percentile end to end. */
class QuantileSketchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  test("rank bounds contain the true rank value — mixed signs, zeros, dups") {
    val rnd = new java.util.Random(11)
    val vals = Array.tabulate(20000) { i =>
      if (i % 97 == 0) 0.0
      else if (i % 5 == 0) -math.exp(rnd.nextGaussian() * 6)
      else if (i % 7 == 0) 42.5 // heavy duplicate
      else math.exp(rnd.nextGaussian() * 6)
    }
    val s = QuantileSketch()
    vals.foreach(s.add(_))
    val sorted = vals.sorted
    assert(s.totalCount == vals.length)
    Seq(1, 2, 100, 9999, 10000, 19999, 20000).foreach { r =>
      val b = s.rankBounds(r.toLong)
      val v = sorted(r - 1)
      assert(b.lo <= v && v <= b.hi, s"rank $r: $v outside [${b.lo}, ${b.hi}]")
      // `below` is the exact count of values before the range
      assert(sorted.count(_ < b.lo) == b.below)
      assert(sorted.count(x => x >= b.lo && x <= b.hi) == b.inRange)
    }
  }

  test("merge ≡ sketching the concatenation; serialization round-trips") {
    val rnd = new java.util.Random(7)
    val a = Array.fill(5000)(rnd.nextDouble() * 1e6 - 5e5)
    val b = Array.fill(3000)(rnd.nextDouble() * 1e3)
    val sa = QuantileSketch(); a.foreach(sa.add(_))
    val sb = QuantileSketch(); b.foreach(sb.add(_))
    val merged = QuantileSketch.fromBytes(sa.toBytes).get
      .merge(QuantileSketch.fromBytes(sb.toBytes).get)
    val all = QuantileSketch(); (a ++ b).foreach(all.add(_))
    val sorted = (a ++ b).sorted
    Seq(1L, 4000L, 8000L).foreach { r =>
      val bm = merged.rankBounds(r); val ba = all.rankBounds(r)
      assert(bm == ba)
      assert(bm.lo <= sorted((r - 1).toInt) && sorted((r - 1).toInt) <= bm.hi)
    }
  }

  test("refinement buckets are prefix extensions: finer sketch narrows, never excludes") {
    val rnd = new java.util.Random(3)
    val vals = Array.fill(10000)(math.exp(rnd.nextGaussian() * 3))
    val coarse = QuantileSketch(7); val fine = QuantileSketch(20)
    vals.foreach { v => coarse.add(v); fine.add(v) }
    val sorted = vals.sorted
    val r = 5000L
    val bc = coarse.rankBounds(r); val bf = fine.rankBounds(r)
    assert(bf.lo >= bc.lo && bf.hi <= bc.hi, "finer bucket must nest inside coarser")
    assert(bf.lo <= sorted(4999) && sorted(4999) <= bf.hi)
    // full-mantissa sketch pins the exact value
    val exact = QuantileSketch(52); vals.foreach(exact.add(_))
    val be = exact.rankBounds(r)
    assert(be.lo == be.hi && be.lo == sorted(4999))
  }

  test("end-to-end: manifest sketches answer exact ranks over a vortex dataset") {
    val dir = java.nio.file.Files.createTempDirectory("sketch_e2e").toString
    import spark.implicits._
    val rnd = new java.util.Random(5)
    // duplicates + spread + negatives, several files
    val data = Seq.fill(40000)(math.floor(rnd.nextGaussian() * 500) / 4.0)
    data.toDF("v").repartition(5)
      .write.format("vortex").option("distributionSketches", "v")
      .mode("overwrite").save(dir)
    // the manifest path must actually be used (complete coverage)
    assert(SketchPercentile.manifestSketch(spark, dir, "v").isDefined)
    val sorted = data.sorted
    Seq(1L, 13333L, 20000L, 39999L).foreach { k =>
      val got = SketchPercentile.exactRankValue(spark, dir, "v", k)
      assert(got == sorted((k - 1).toInt), s"rank $k")
    }
  }

  test("integral column + missing-sketch fallback stay exact") {
    val dir = java.nio.file.Files.createTempDirectory("sketch_long").toString
    import spark.implicits._
    val rnd = new java.util.Random(9)
    val data = Seq.fill(10000)(rnd.nextLong() % 1000000L)
    data.toDF("v").repartition(3)
      .write.format("vortex").mode("overwrite").save(dir) // NO sketches
    assert(SketchPercentile.manifestSketch(spark, dir, "v").isEmpty)
    val sorted = data.sorted
    // scan-built stage-0 sketch, then the same refinement
    assert(SketchPercentile.exactRankValue(spark, dir, "v", 5000L) == sorted(4999).toDouble)
  }

  test("exact zeros next to subnormals: the ±0.0-bounded buckets must not re-admit zeros") {
    // The minimal-magnitude nonzero buckets (keys 0 and -1) have IEEE
    // bounds lo = +0.0 / hi = -0.0, but exact zeros are counted in the
    // sketch's separate zero bucket. The refine/collect range filter
    // must exclude them or every rank inside those buckets shifts.
    val dir = java.nio.file.Files.createTempDirectory("sketch_zero").toString
    import spark.implicits._
    val sub = Seq(4.9e-324, 1.0e-320, 1.7e-315, 2.2e-311) // key-0 bucket
    val negSub = Seq(-4.9e-324, -3.3e-318)                // key -1 bucket
    val data = Seq.fill(50)(0.0) ++ sub ++ negSub ++
      Seq.fill(20)(-1.5) ++ Seq.fill(20)(2.5)
    data.toDF("v").repartition(2)
      .write.format("vortex").option("distributionSketches", "v")
      .mode("overwrite").save(dir)
    val sorted = data.sorted
    (1L to data.length.toLong).foreach { k =>
      val got = SketchPercentile.exactRankValue(spark, dir, "v", k)
      assert(got == sorted((k - 1).toInt), s"rank $k")
    }
  }
}
