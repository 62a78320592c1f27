package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** t_mix_temperature (α = 0.5 temperature-flattened per-source
  * sampling): thresholds must be exactly base·√(m_min/m_s)·2³², the
  * selected set must be exactly the bucket<thr rows, and a heavier
  * source must never get a higher keep-rate than a lighter one. */
class MixTemperatureSpec extends AnyFunSuite {
  lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private def bucket(id: Long): Long = ((id % 2147483647L) * 2654435761L) % 4294967296L

  test("matches the scalar reference on sf0.001 and thresholds are monotone in mass") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = Tables.t(spark, sfDir, "documents")
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

    val mass = docs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val mMin = mass.values.min
    val thr = mass.map { case (src, m) =>
      src -> math.floor(0.75 * math.sqrt(mMin.toDouble / m) * 4294967296.0).toLong
    }
    val want = docs
      .filter { case (id, src, _) => bucket(id) < thr(src) }
      .map { case (id, src, _) => (id, src, mass(src), thr(src), bucket(id)) }
      .sortBy(_._1)

    val got = queries.TextOps.set.queries("t_mix_temperature")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == want)
    assert(got.nonEmpty)

    // monotone: more mass, never a higher threshold; the lightest
    // source keeps the full base rate
    val bySrc = thr.toSeq.sortBy(s => mass(s._1))
    assert(bySrc.zip(bySrc.tail).forall { case ((_, t1), (_, t2)) => t2 <= t1 })
    assert(thr(mass.minBy(_._2)._1) == math.floor(0.75 * 4294967296.0).toLong)
  }

  test("skewed masses produce genuinely different keep-rates") {
    val sfDir = "/root/testdata/sf0.001"
    val out = queries.TextOps.set.queries("t_mix_temperature")(spark, sfDir)
    val nThr = out.select(countDistinct(col("thr"))).collect()(0).getLong(0)
    assert(nThr > 1, "all thresholds equal — the temperature weighting is not exercised")
  }
}
