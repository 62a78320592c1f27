package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VecFixedPoint

/** v_cos_quantized (int8-normalized-code ANN): code vectors must have
  * norm ≈ 127 (the quantizer really normalizes), integer scores must
  * be symmetric and reproducible, and the quantized ranking must stay
  * within the quantization error bound of the exact cosine ranking. */
class QuantizedTopkSpec extends AnyFunSuite {
  lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private def codesAndExact(sfDir: String)
      : (Map[Long, Array[Int]], Map[Long, (Array[Long], Long)]) = {
    val raw = Tables.t(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val fixed = raw.map { case (id, e) =>
      val q = VecFixedPoint.quantize(e)
      id -> (q, VecFixedPoint.dot(q, q))
    }.toMap
    val codes = fixed.map { case (id, (q, saa)) =>
      val c = new Array[Int](q.length)
      if (saa != 0L) {
        val nrm = math.sqrt(VecFixedPoint.decToDouble(saa))
        var i = 0
        while (i < q.length) {
          c(i) = math.floor(127.0 * VecFixedPoint.dec8ToDouble(q(i)) / nrm + 0.5).toInt
          i += 1
        }
      }
      id -> c
    }
    (codes, fixed)
  }

  test("codes are unit-norm at scale 127 within the rounding bound") {
    val (codes, fixed) = codesAndExact("/root/testdata/sf0.001")
    codes.foreach { case (id, c) =>
      if (fixed(id)._2 != 0L) {
        val n = math.sqrt(c.map(x => x.toLong * x).sum.toDouble)
        assert(math.abs(n - 127.0) < 8.0, s"vec $id code norm $n")
        assert(c.forall(x => x >= -127 && x <= 127))
      }
    }
  }

  test("query output equals the driver recomputation and respects the error bound") {
    val sfDir = "/root/testdata/sf0.001"
    val (codes, fixed) = codesAndExact(sfDir)
    val queriesIds = codes.keys.filter(_ < 20).toSeq.sorted

    val want = queriesIds.flatMap { qid =>
      val qc = codes(qid)
      codes.toSeq.filter(_._1 != qid)
        .map { case (cid, cc) =>
          var d = 0L; var i = 0
          while (i < qc.length) { d += qc(i).toLong * cc(i); i += 1 }
          (cid, d)
        }
        .sortBy { case (cid, d) => (-d, cid) }
        .take(5).zipWithIndex
        .map { case ((cid, d), r) => (qid, (r + 1).toLong, cid, d) }
    }
    val got = queries.SimilarityOps.set.queries("v_cos_quantized")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)

    // error bound: the exact cosine of the quantized top-1 neighbor is
    // within the int8 quantization error of the exact top-1 cosine
    // (|cosq - cos| ≲ 2·√64·0.5/127 ≈ 0.063 per vector pair)
    def cos(a: Long, b: Long): Double =
      VecFixedPoint.cos(VecFixedPoint.dot(fixed(a)._1, fixed(b)._1), fixed(a)._2, fixed(b)._2)
    queriesIds.foreach { qid =>
      val chosen = got.filter(g => g._1 == qid && g._2 == 1L).head._3
      val bestExact = codes.keys.filter(_ != qid).map(cos(qid, _)).max
      assert(bestExact - cos(qid, chosen) <= 0.13,
        s"query $qid: quantized top-1 cosine ${cos(qid, chosen)} vs exact best $bestExact")
    }
  }
}
