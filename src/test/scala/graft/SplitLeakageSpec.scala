package graft

import org.scalatest.funsuite.AnyFunSuite

/** d_split_leakage must equal the composition it claims to be: the
  * d_minhash_lsh pair set, split-labeled by the t_split_assign bucket
  * function, cross-split pairs only. */
class SplitLeakageSpec extends AnyFunSuite {
  lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private def splitOf(id: Long): String = {
    val b = (id % 2147483647L) * 2654435761L % 4294967296L
    if (b < 3435973837L) "train" else if (b < 3865470566L) "val" else "test"
  }

  test("equals the lsh-pairs x split-function composition") {
    val pairs = queries.DedupOps.set.queries("d_minhash_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = pairs
      .map { case (a, b) => (splitOf(a), splitOf(b)) }
      .filter { case (sa, sb) => sa != sb }
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((sa, sb), n) => (sa, sb, n) }
      .sortBy(t => (t._1, t._2))

    val got = queries.DedupOps.set.queries("d_split_leakage")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(got.nonEmpty, "the saturated synthetic corpus must leak")
    // only cross-split rows may appear
    assert(got.forall(t => t._1 != t._2))
  }
}
