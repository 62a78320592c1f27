package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VecFixedPoint

/** v_semdedup (cluster-scoped semantic dedup, the SemDeDup shape):
  * a vector is dropped iff SOME lower-id vector of the same k-means
  * cluster has cos₄ ≥ τ with it — the minimal-representatives rule.
  * Verified against a direct driver-side pair scan of the same
  * clustering on sf0.001. */
class SemDedupSpec extends AnyFunSuite {
  lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  test("kept/dropped flags equal the direct pair-scan reference on sf0.001") {
    val sfDir = "/root/testdata/sf0.001"
    import spark.implicits._
    val raw = Tables.t(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val fixed = raw.map { case (id, e) =>
      val q = VecFixedPoint.quantize(e)
      (id, q, VecFixedPoint.dot(q, q))
    }

    // same clustering as the query (K=8, 2 refinements)
    val ds = Tables.t(spark, sfDir, "embeddings")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("label"),
        org.apache.spark.sql.functions.col("embedding"))
      .as[(Long, Int, Seq[Float])]
      .map { case (id, lb, e) =>
        val q = VecFixedPoint.quantize(e)
        queries.SimilarityOps.QVec(id, lb, q, VecFixedPoint.dot(q, q))
      }
    val assigned = queries.SimilarityOps.kmeansAssign(spark, ds, K = 8, refinements = 2)
      .collect().map(t => (t._1, t._2)).toMap

    val thr = new java.math.BigDecimal("0.2500")
    val want = fixed.sortBy(_._1).map { case (id, q, saa) =>
      val cluster = assigned(id)
      val droppedBy = fixed.exists { case (oid, oq, osaa) =>
        oid < id && assigned(oid) == cluster && {
          val dot = VecFixedPoint.dot(oq, q)
          dot > 0 && VecFixedPoint.cos4(dot, osaa, saa).compareTo(thr) >= 0
        }
      }
      (id, cluster.toLong, !droppedBy)
    }.toSeq

    val got = queries.SimilarityOps.set.queries("v_semdedup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got == want)
    assert(got.exists(!_._3), "no vector was ever dropped — τ never fired")
    assert(got.exists(_._3), "every vector dropped — degenerate threshold")
  }
}
