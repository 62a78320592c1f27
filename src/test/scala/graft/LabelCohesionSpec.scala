package graft

import org.scalatest.funsuite.AnyFunSuite

/** v_label_cohesion against a scalar double reference on sf0.001:
  * same quantization, same sum-vector identity (cos-to-centroid ==
  * cos-to-sum), tolerance at the query's own 1e-6 rounding. */
class LabelCohesionSpec extends AnyFunSuite {
  lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("matches the scalar reference and is bounded by (0, 1] for positive-heavy data") {
    val vecs = Tables.t(spark, sfDir, "embeddings")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getInt(1),
        functions.VecFixedPoint.quantize(r.getSeq[Float](2)))).toSeq

    val want = vecs.groupBy(_._1).toSeq.map { case (lb, vs) =>
      val sum = new Array[Double](64)
      vs.foreach { case (_, q) => var j = 0; while (j < 64) { sum(j) += q(j) / 1e8; j += 1 } }
      val snorm = math.sqrt(sum.map(x => x * x).sum)
      val terms = vs.map { case (_, q) =>
        val qd = q.map(_ / 1e8)
        val dot = qd.zip(sum).map { case (a, b) => a * b }.sum
        dot / (math.sqrt(qd.map(x => x * x).sum) * snorm)
      }
      (lb, vs.size.toLong, terms.sum / terms.size)
    }.sortBy(_._1)

    val got = queries.SimilarityOps.set.queries("v_label_cohesion")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(t => (t._1, t._2)) == want.map(t => (t._1, t._2)))
    got.zip(want).foreach { case ((_, _, g), (_, _, w)) =>
      assert(math.abs(g - w) < 2e-6, s"cohesion $g vs scalar $w")
    }
    // each vector's cosine to its own centroid can't exceed 1; a
    // coherent-ish synthetic corpus should stay strictly positive
    assert(got.forall(t => t._3 > 0.0 && t._3 <= 1.0))
    assert(got.size > 1)
  }
}
