package graft.sources.vortex

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Metadata-routed EXACT rank statistics over a vortex dataset — what
  * the stored QuantileSketch manifests exist for.
  *
  * `exactRankValue(dir, col, k)` returns the k-th smallest non-null
  * value of the column, exactly, without ever sorting or collecting
  * the data:
  *
  *  1. The per-file manifest sketches merge into one (pure metadata —
  *     no data I/O). Exact bucket counts give the bucket holding rank
  *     k, the exact count below it, and its exact value range
  *     [lo, hi] (relative width 2^-7).
  *  2. REFINE: one aggregate pass over only the rows in [lo, hi]
  *     (a pushed range filter — chunk min/max pruning applies)
  *     builds a finer sketch with 13 more prefix bits. Because a
  *     child bucket is a bit-prefix extension of its parent, the
  *     refined sketch has at most 2^13 = 8192 buckets regardless of
  *     data size — a bounded, deterministic, distributed aggregate.
  *  3. Repeat until the candidate bucket is a single double value
  *     (prefix 52 = full mantissa → lo == hi), at most 4 passes,
  *     usually fewer: stop early when the remaining range holds few
  *     enough rows to gate-collect (the ExactPercentile small-path
  *     pattern).
  *
  * Scale: pass p scans only the rows inside a 2^-(7+13p)-relative
  * range of the answer; with any value spread the row count collapses
  * geometrically, and the scans are chunk-pruned so late passes touch
  * a handful of chunks. The driver only ever sees ≤8192-entry count
  * maps — never values. Works on columns with heavy duplication too:
  * a single value occupying the whole bucket short-circuits at
  * lo == hi without collecting anything.
  *
  * Supported: Double columns and integral columns (whose long→double
  * view is exact up to 2^53 — enforced against the merged manifest
  * range). Files lacking a sketch (foreign writers, pre-sketch
  * commits) degrade to one extra full pass that builds the stage-0
  * sketch by scanning — same algorithm, one more job, never a wrong
  * answer.
  */
object SketchPercentile {
  private val RefineBits = 13
  private val CollectCap = 65536

  /** k is 1-based among the column's non-null values ascending. */
  def exactRankValue(spark: SparkSession, dir: String, column: String, k: Long): Double = {
    val df = spark.read.format("vortex").load(dir)
    val field = df.schema(column)
    val integral = field.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case DoubleType => false
      case dt => throw new IllegalArgumentException(
        s"sketch percentile unsupported for ${dt.simpleString} column $column")
    }
    val base = manifestSketch(spark, dir, column)
      .getOrElse(scanSketch(df, column, integral, QuantileSketch.DefaultPrefixBits))
    var bits = base.prefixBits
    var sketch = base
    var k0 = k // rank within the current candidate range
    var bounds = sketch.rankBounds(k0)
    while (bounds.lo != bounds.hi && bounds.inRange > CollectCap && bits < 52) {
      k0 -= bounds.below
      bits = math.min(52, bits + RefineBits)
      sketch = scanSketch(inRange(df, column, integral, bounds), column, integral, bits)
      bounds = sketch.rankBounds(k0)
    }
    if (bounds.lo == bounds.hi) bounds.lo
    else {
      // gated small path: the remaining range holds ≤ CollectCap rows
      // (or the full-mantissa sketch still has a multi-value bucket,
      // impossible by construction — lo==hi at 52 bits)
      val vals = inRange(df, column, integral, bounds)
        .select(col(column).cast(DoubleType)).collect().map(_.getDouble(0)).sorted
      vals((k0 - bounds.below - 1).toInt)
    }
  }

  /** rows with double view inside [lo, hi] — exact literals in the
    * column's own domain so the filter pushes down and chunk min/max
    * pruning applies */
  private def inRange(df: DataFrame, column: String, integral: Boolean,
                      b: RankBounds): DataFrame = {
    // The minimal-magnitude nonzero buckets have IEEE bounds that read
    // ±0.0 (key 0 → lo = +0.0, key -1 → hi = -0.0), but exact zeros
    // live in the sketch's SEPARATE zero bucket — `below` already
    // counted them. Re-admitting them here would shift every refined
    // rank. (The pure zero bucket itself never reaches inRange: its
    // lo == hi short-circuits upstream.)
    val excludeZero = b.lo == 0.0 || b.hi == 0.0
    val ranged = if (integral) {
      // exactness of the long↔double range translation requires the
      // exact-double region: beyond 2^53 a long can round INTO a
      // bucket whose back-translated long range excludes it
      require(math.abs(b.lo) <= (1L << 53).toDouble && math.abs(b.hi) <= (1L << 53).toDouble,
        s"sketch percentile: integral range [${b.lo}, ${b.hi}] beyond exact-double domain")
      val lo = math.ceil(b.lo).toLong
      val hi = math.floor(b.hi).toLong
      df.where(col(column) >= lo && col(column) <= hi)
    } else
      df.where(col(column) >= b.lo && col(column) <= b.hi)
    if (excludeZero) ranged.where(col(column) =!= 0) else ranged
  }

  /** one distributed aggregate pass → merged sketch at `bits` prefix
    * bits; bounded by the number of distinct buckets present */
  private def scanSketch(df: DataFrame, column: String, integral: Boolean,
                         bits: Int): QuantileSketch = {
    import df.sparkSession.implicits._
    val doubles = df.select(col(column).cast(DoubleType)).na.drop().as[Double]
    val parts = doubles.mapPartitions { it =>
      val s = QuantileSketch(bits)
      it.foreach(s.add(_))
      Iterator.single(s.toBytes)
    }.collect() // one serialized count-map per partition, ≤ ~16 B/bucket
    val merged = QuantileSketch(bits)
    parts.foreach(b => QuantileSketch.fromBytes(b).foreach(merged.merge))
    merged
  }

  /** merged manifest sketches IFF every data file is covered by a
    * schema-valid manifest entry carrying a sketch for `column` —
    * partial coverage returns None (fall back to scanning; a silently
    * incomplete merge would return a WRONG exact answer) */
  def manifestSketch(spark: SparkSession, dir: String,
                                     column: String): Option[QuantileSketch] = {
    val hconf = spark.sessionState.newHadoopConf()
    val root = StatsManifest.rootOf(dir, hconf).getOrElse(return None)
    val fs = root.getFileSystem(hconf)
    if (!fs.exists(root)) return None
    val entries = StatsManifest.read(root, hconf)
    if (entries.isEmpty) return None
    val files = PartitionedLayout.listWithPartitions(root, hconf)
    if (files.isEmpty) return None
    val rootQ = fs.makeQualified(root).toString
    val merged = QuantileSketch(QuantileSketch.DefaultPrefixBits)
    files.foreach { case (st, _) =>
      val rel = fs.makeQualified(st.getPath).toString.stripPrefix(rootQ).stripPrefix("/")
      val e = entries.get(rel).filter(_.len == st.getLen).getOrElse(return None)
      val sk = e.cols.find(_.name == column).flatMap(_.sketch)
        .flatMap(QuantileSketch.fromBytes).getOrElse(return None)
      if (sk.prefixBits != merged.prefixBits) return None
      merged.merge(sk)
    }
    Some(merged)
  }
}
