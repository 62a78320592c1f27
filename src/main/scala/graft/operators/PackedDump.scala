package graft.operators

import org.apache.spark.Partitioner
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Globally ordered dump of a packed-long-key frame WITHOUT a
  * row-at-a-time range exchange (r15 optimization round, guide §2.3
  * "shuffle fewer bytes" / §8 "move heavy bytes once, as few units as
  * possible").
  *
  * The ordered pair dumps (d_minhash_lsh, d_jaccard) end in
  * `repartitionByRange(8).sortWithinPartitions` over millions of
  * 8-byte keys. LshProbe pins that exchange alone at ~2.2 s for 6.7 M
  * keys / 54 MB at sf0.1 — Spark's sort-based shuffle pays its
  * serialize+write+fetch machinery PER ROW, so a single-long row is
  * the worst bytes-per-overhead shape it has. Here each map task
  * range-buckets its keys into primitive builders and ships ONE fat
  * row per (bucket, task) — the same 54 MB crosses the shuffle in
  * ~nb×tasks array rows instead of 6.7 M singleton rows — and each
  * reduce task concatenates, sorts primitively, and emits its bucket
  * in key order. Output rows and their global order are IDENTICAL to
  * the range-sort plan: bucket ranges ascend with partition index
  * (identity partitioner), rows ascend within each bucket.
  *
  * Bounds come from a fixed-seed sample of the PINNED input (callers
  * pin first — the pipelines are too expensive to let a sampling pass
  * re-execute, the same reason the r11 checkpoint landed). Boundary
  * choice affects only bucket SIZES, never content or order, so the
  * output is deterministic regardless of sampling.
  *
  * Scale shape: one reduce task holds one bucket's keys (8 B each) in
  * memory; `buckets` grows with the key count (~1 M keys / 8 MB per
  * bucket), so per-task state is bounded at any scale and parallelism
  * follows the data. The quadratic-OUTPUT rows this serves are
  * sf0.1-bench shapes (excluded from sf1 totals as documented); the
  * operator itself carries no driver state beyond the sampled bounds.
  */
object PackedDump {

  private final class IdentityPartitioner(n: Int) extends Partitioner {
    override def numPartitions: Int = n
    override def getPartition(key: Any): Int = key.asInstanceOf[Int]
  }

  /** ascending split points (len = buckets-1) from a fixed-seed sample */
  private def sampleBounds(pinned: DataFrame, keyCol: String,
                           buckets: Int, rows: Long): Array[Long] = {
    if (rows == 0L) return Array.empty
    val want = 200L * buckets
    val frac = math.min(1.0, want.toDouble / rows)
    val sample = pinned.select(col(keyCol)).sample(withReplacement = false, frac, 42L)
      .as(Encoders.scalaLong).collect().sorted
    if (sample.isEmpty) return Array.empty
    Array.tabulate(buckets - 1) { i =>
      sample(((i + 1).toLong * sample.length / buckets).toInt.min(sample.length - 1))
    }
  }

  private def bucketCount(rows: Long): Int =
    math.max(8L, math.min(512L, (rows + 999999L) / 1000000L)).toInt

  private def bucketOf(bounds: Array[Long], k: Long): Int = {
    // first bucket whose upper bound is > k (bounds ascending)
    var lo = 0; var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= k) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** `pinned` MUST be materialized (localCheckpoint/cache): it is
    * consumed twice (bounds sample + the dump). Returns the keys
    * globally sorted ascending, one LongType column named `keyCol`. */
  def sortedLongs(s: SparkSession, pinned: DataFrame, keyCol: String): DataFrame = {
    val rows = pinned.count()
    val nb = bucketCount(rows)
    val bounds = sampleBounds(pinned, keyCol, nb, rows)
    val ord = pinned.select(col(keyCol)).queryExecution.toRdd
      .mapPartitions { it =>
        val bufs = Array.fill(nb)(new scala.collection.mutable.ArrayBuilder.ofLong)
        while (it.hasNext) {
          val k = it.next().getLong(0)
          bufs(bucketOf(bounds, k)) += k
        }
        Iterator.range(0, nb).flatMap { b =>
          val a = bufs(b).result()
          if (a.isEmpty) Iterator.empty else Iterator.single((b, a))
        }
      }
      .partitionBy(new IdentityPartitioner(nb))
      .mapPartitions { it =>
        val arrs = it.map(_._2).toArray
        var total = 0
        arrs.foreach(total += _.length)
        val all = new Array[Long](total)
        var off = 0
        arrs.foreach { a => System.arraycopy(a, 0, all, off, a.length); off += a.length }
        java.util.Arrays.sort(all)
        all.iterator
      }
    s.createDataset(ord)(Encoders.scalaLong).toDF(keyCol)
  }

  /** keys + one DOUBLE payload, globally sorted by key (ties keep the
    * payloads adjacent in whichever order the dual-array sort leaves —
    * callers here have UNIQUE keys, asserted nowhere cheaper than the
    * oracle's own DISTINCT pair semantics). Columns: keyCol, payCol. */
  def sortedLongsWithDouble(s: SparkSession, pinned: DataFrame,
                            keyCol: String, payCol: String): DataFrame = {
    val rows = pinned.count()
    val nb = bucketCount(rows)
    val bounds = sampleBounds(pinned, keyCol, nb, rows)
    val ord = pinned.select(col(keyCol), col(payCol)).queryExecution.toRdd
      .mapPartitions { it =>
        val kb = Array.fill(nb)(new scala.collection.mutable.ArrayBuilder.ofLong)
        val vb = Array.fill(nb)(new scala.collection.mutable.ArrayBuilder.ofDouble)
        while (it.hasNext) {
          val r = it.next()
          val k = r.getLong(0); val v = r.getDouble(1)
          val b = bucketOf(bounds, k)
          kb(b) += k; vb(b) += v
        }
        Iterator.range(0, nb).flatMap { b =>
          val ka = kb(b).result()
          if (ka.isEmpty) Iterator.empty
          else Iterator.single((b, (ka, vb(b).result())))
        }
      }
      .partitionBy(new IdentityPartitioner(nb))
      .mapPartitions { it =>
        val parts = it.map(_._2).toArray
        var total = 0
        parts.foreach(total += _._1.length)
        val ks = new Array[Long](total); val vs = new Array[Double](total)
        var off = 0
        parts.foreach { case (ka, va) =>
          System.arraycopy(ka, 0, ks, off, ka.length)
          System.arraycopy(va, 0, vs, off, va.length)
          off += ka.length
        }
        sortPaired(ks, vs)
        Iterator.range(0, total).map(i => (ks(i), vs(i)))
      }
    s.createDataset(ord)(Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
      .toDF(keyCol, payCol)
  }

  /** dual-array quicksort by key (payload permuted alongside) —
    * primitive arrays, no boxing; insertion sort under 32 elements */
  private[graft] def sortPaired(ks: Array[Long], vs: Array[Double]): Unit = {
    def swap(i: Int, j: Int): Unit = {
      val k = ks(i); ks(i) = ks(j); ks(j) = k
      val v = vs(i); vs(i) = vs(j); vs(j) = v
    }
    def insertion(lo: Int, hi: Int): Unit = {
      var i = lo + 1
      while (i <= hi) {
        val k = ks(i); val v = vs(i)
        var j = i - 1
        while (j >= lo && ks(j) > k) { ks(j + 1) = ks(j); vs(j + 1) = vs(j); j -= 1 }
        ks(j + 1) = k; vs(j + 1) = v
        i += 1
      }
    }
    def qs(lo: Int, hi: Int): Unit = {
      if (hi - lo < 32) { if (lo < hi) insertion(lo, hi); return }
      // median-of-three pivot
      val mid = (lo + hi) >>> 1
      if (ks(mid) < ks(lo)) swap(mid, lo)
      if (ks(hi) < ks(lo)) swap(hi, lo)
      if (ks(hi) < ks(mid)) swap(hi, mid)
      val p = ks(mid)
      var i = lo; var j = hi
      while (i <= j) {
        while (ks(i) < p) i += 1
        while (ks(j) > p) j -= 1
        if (i <= j) { swap(i, j); i += 1; j -= 1 }
      }
      qs(lo, j); qs(i, hi)
    }
    qs(0, ks.length - 1)
  }
}
