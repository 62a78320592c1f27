package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.util.AccumulatorV2

/** Max gauge across tasks — used by specs to assert the bucket-size
  * bound actually held during a run (accumulators are the only channel
  * out of executor-side group processing). */
final class MaxAccumulator extends AccumulatorV2[Long, Long] {
  private var mx = 0L
  override def isZero: Boolean = mx == 0L
  override def copy(): MaxAccumulator = { val c = new MaxAccumulator; c.mx = mx; c }
  override def reset(): Unit = mx = 0L
  override def add(v: Long): Unit = if (v > mx) mx = v
  override def merge(o: AccumulatorV2[Long, Long]): Unit = if (o.value > mx) mx = o.value
  override def value: Long = mx
}

/** Exact all-pairs-within-bucket with BOUNDED task size.
  *
  * LSH-banded kernels (MinHash bands, hyperplane buckets) group rows by
  * a bucket key and score every pair inside the group. On natural
  * corpora buckets are small; on template corpora (near-identical
  * documents sharing a band signature) one bucket can hold a large
  * fraction of the corpus, piling O(m²) work and O(m) memory onto a
  * single task — the one 100 TB failure mode of the banded shape.
  *
  * This operator keeps the pair set EXACTLY identical (no recall loss,
  * unlike re-banding on extra hyperplanes, which can separate a true
  * near-duplicate pair) while bounding every task:
  *
  *  1. one cheap size aggregation over the bucket rows finds buckets
  *     larger than `cap` (none, on natural corpora — the common path
  *     pays one broadcast-joined count);
  *  2. small buckets score in one task exactly as before;
  *  3. oversized buckets replicate each row to `blocks` block keys —
  *     each unordered block pair (bi ≤ bj) becomes its OWN task that
  *     scores only cross-block (or within-block when bi == bj) pairs.
  *     Every unordered item pair lands in exactly one block-pair group,
  *     so the union of (2) and (3) is the exact bucket pair set.
  *
  * Per-task bounds: ≤ `cap` items on the small path, ≤ 2·⌈m/blocks⌉ on
  * the block path; work Θ((m/blocks)²) per task spread over
  * blocks·(blocks+1)/2 tasks. Shuffle cost is O(m·blocks) for oversized
  * buckets only. The output size itself can be Θ(m²) when the bucket
  * is a genuine duplicate clique — that is the answer, not overhead.
  *
  * No driver-side state: the oversized-key set stays distributed
  * (broadcast hash join against a count aggregate, O(#buckets/cap) rows).
  */
object BoundedBucketPairs {

  /** @param buckets (band, bucketKey, item) rows; a "bucket" is one
    *                distinct (band, bucketKey)
    * @param cap     max items scored in a single small-path task
    * @param blocks  block count for oversized buckets
    * @param blockOf deterministic block assignment for an item (any Int;
    *                reduced mod `blocks`)
    * @param emit    symmetric pair scorer: must canonicalize output
    *                order itself (it may see (a,b) or (b,a))
    * @param gauge   optional max-group-size accumulator for tests
    */
  def pairs[I: scala.reflect.ClassTag, O](buckets: Dataset[(Int, String, I)], cap: Int, blocks: Int,
                  blockOf: I => Int,
                  emit: (Int, I, I) => Iterator[O],
                  gauge: Option[MaxAccumulator] = None)(
      implicit iEnc: Encoder[(Int, String, I)],
      rEnc: Encoder[(Int, String, Int, Int, I)],
      oEnc: Encoder[O]): Dataset[O] = {
    val ss = buckets.sparkSession
    import ss.implicits._
    // The size probe recomputes the upstream pipeline instead of
    // pinning it: a localCheckpoint here would hold corpus×bands rows
    // in executor storage AND break lineage without reliability — an
    // executor loss at 100 TB would kill the job instead of recomputing
    // (signature hashing is cheap to replay; measured same-order wall
    // time, see DedupOps dump-path note).
    val brDF = buckets.toDF("band", "bk", "item")
    val over = brDF.groupBy(col("band").as("ob"), col("bk").as("ok"))
      .agg(count(lit(1)).as("sz")).filter(col("sz") > cap).select("ob", "ok")
    val flagged = brDF.join(broadcast(over),
      col("band") === col("ob") && col("bk") === col("ok"), "left")
    val small = flagged.filter(col("ob").isNull)
      .select("band", "bk", "item").as[(Int, String, I)]
    val big = flagged.filter(col("ob").isNotNull)
      .select("band", "bk", "item").as[(Int, String, I)]

    val direct = small.groupByKey(r => (r._1, r._2)).flatMapGroups {
      (k: (Int, String), it: Iterator[(Int, String, I)]) =>
        val items = it.map(_._3).toArray
        gauge.foreach(_.add(items.length.toLong))
        for {
          i <- items.indices.iterator
          j <- (i + 1 until items.length).iterator
          o <- emit(k._1, items(i), items(j))
        } yield o
    }

    val blockPairs = big.flatMap { case (band, bk, item) =>
      val blk = math.floorMod(blockOf(item), blocks)
      Iterator.tabulate(blocks)(c => (band, bk, math.min(blk, c), math.max(blk, c), item))
    }.groupByKey(r => (r._1, r._2, r._3, r._4)).flatMapGroups {
      (k: (Int, String, Int, Int), it: Iterator[(Int, String, Int, Int, I)]) =>
        val items = it.map(_._5).toArray
        gauge.foreach(_.add(items.length.toLong))
        val (band, bi, bj) = (k._1, k._3, k._4)
        if (bi == bj)
          for {
            i <- items.indices.iterator
            j <- (i + 1 until items.length).iterator
            o <- emit(band, items(i), items(j))
          } yield o
        else {
          val (la, lb) = items.partition(x => math.floorMod(blockOf(x), blocks) == bi)
          for { a <- la.iterator; b <- lb.iterator; o <- emit(band, a, b) } yield o
        }
    }

    direct.union(blockPairs)
  }
}
