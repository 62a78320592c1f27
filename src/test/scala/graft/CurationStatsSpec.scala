package graft

import org.scalatest.funsuite.AnyFunSuite

/** t_vocab_coverage and t_length_outliers against scalar references
  * computed driver-side on sf0.001 (500 docs, 30-word vocab). */
class CurationStatsSpec extends AnyFunSuite {
  lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val docs: Seq[(Long, String, String, Long)] =
    Tables.t(spark, sfDir, "documents")
      .select("doc_id", "source", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  test("vocab coverage matches the scalar reference and is monotone to 1.0") {
    val freq = docs.flatMap(_._3.split(" ", -1)).groupBy(identity)
      .view.mapValues(_.size.toLong).toSeq
      .sortBy { case (tok, c) => (-c, tok) }
    val total = freq.map(_._2).sum
    val want = freq.zipWithIndex.map { case ((tok, c), i) =>
      val cum = freq.take(i + 1).map(_._2).sum
      (i + 1L, tok, c, cum.toDouble / total)
    }

    val got = queries.TextOps.set.queries("t_vocab_coverage")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want)
    assert(got.last._4 == 1.0) // exact: cum == total at the last rank
    assert(got.map(_._4).sliding(2).forall(p => p.head <= p.last))
  }

  test("length outliers match the interpolated-percentile scalar reference") {
    val sorted = docs.map(_._4.toDouble).sorted
    def pct(p: Double): Double = {
      val idx = (sorted.length - 1) * p
      val lo = math.floor(idx).toInt; val hi = math.ceil(idx).toInt
      sorted(lo) + (idx - lo) * (sorted(hi) - sorted(lo))
    }
    val (lo, hi) = (pct(0.01), pct(0.99))
    val kept = docs.filter(t => t._4 > lo && t._4 < hi)
    assert(kept.nonEmpty && kept.size < docs.size, "the clip must drop something")
    val want = kept.groupBy(_._2).toSeq.map { case (src, rs) =>
      (src, rs.size.toLong, rs.map(_._4).min, rs.map(_._4).max)
    }.sortBy(_._1)

    val got = queries.TextOps.set.queries("t_length_outliers")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
  }
}
