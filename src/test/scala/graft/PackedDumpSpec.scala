package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PackedDump

/** PackedDump (r15 optimization): the array-packed ordered dump must
  * produce exactly the rows and global order of
  * `repartitionByRange(...).sortWithinPartitions(...)`. */
class PackedDumpSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def collectOrdered(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    // partition-index order IS the output order the bench/oracle see
    df.queryExecution.toRdd.map(_.copy()).collect().toSeq
      .map(r => (0 until df.schema.length).map(i =>
        r.get(i, df.schema(i).dataType)))

  test("sortedLongs equals the range-sort plan, including global order") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    // skewed keys + duplicates + extremes
    val keys = Seq.fill(50000)(rng.nextLong() % 1000000L) ++
      Seq(Long.MinValue, Long.MaxValue, 0L, 0L) ++
      Seq.fill(3000)(42L)
    val df = keys.toDF("k").repartition(7).localCheckpoint(true)
    val expect = collectOrdered(
      df.repartitionByRange(8, col("k")).sortWithinPartitions("k"))
    val got = collectOrdered(PackedDump.sortedLongs(spark, df, "k"))
    assert(got == expect)
  }

  test("sortedLongsWithDouble equals the range-sort plan on unique keys") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = rng.shuffle((0L until 40000L).toVector)
      .map(k => (k * 7919L, k.toDouble / 3.0))
    val df = rows.toDF("k", "v").repartition(5).localCheckpoint(true)
    val expect = collectOrdered(
      df.repartitionByRange(8, col("k")).sortWithinPartitions("k"))
    val got = collectOrdered(PackedDump.sortedLongsWithDouble(spark, df, "k", "v"))
    assert(got == expect)
  }

  test("tiny and empty inputs") {
    import spark.implicits._
    val empty = Seq.empty[Long].toDF("k").localCheckpoint(true)
    assert(PackedDump.sortedLongs(spark, empty, "k").count() == 0L)
    val one = Seq(5L).toDF("k").localCheckpoint(true)
    assert(PackedDump.sortedLongs(spark, one, "k").as[Long].collect().toSeq == Seq(5L))
  }

  test("sortPaired: dual-array sort equals a reference sort") {
    val rng = new scala.util.Random(13)
    val n = 100000
    val ks = Array.fill(n)(rng.nextLong() % 5000L)
    val vs = Array.tabulate(n)(_.toDouble)
    val ref = ks.zip(vs).sortBy(_._1).toSeq
    PackedDump.sortPaired(ks, vs)
    assert(ks.toSeq == ref.map(_._1))
    // duplicates: the multiset of (k, v) pairs must be preserved
    assert(ks.zip(vs).toSeq.groupBy(identity).view.mapValues(_.size).toMap ==
      ref.groupBy(identity).view.mapValues(_.size).toMap)
  }
}
