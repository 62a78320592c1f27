package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lexical + hybrid retrieval (RetrievalOps): BM25 against a scalar
  * reference implementation, inverted-index stats against exact
  * counts, and the RRF fusion's defining invariants. */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"
  private val terms = Seq("dup", "spark", "join")

  private def docs: Seq[(Long, Array[String])] =
    Tables.t(spark, sfDir, "documents").select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1))).toSeq.sortBy(_._1)

  test("r_inverted_df matches exact df/cf counts and idf is monotone-decreasing in df") {
    val ds = docs
    val df = scala.collection.mutable.Map.empty[String, Long]
    val cf = scala.collection.mutable.Map.empty[String, Long]
    ds.foreach { case (_, toks) =>
      toks.groupBy(identity).foreach { case (t, xs) =>
        df(t) = df.getOrElse(t, 0L) + 1L
        cf(t) = cf.getOrElse(t, 0L) + xs.length
      }
    }
    val got = queries.RetrievalOps.set.queries("r_inverted_df")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(g => g._1 -> (g._2, g._3)).toMap ==
      df.keys.map(t => t -> (df(t), cf(t))).toMap)
    // ordering: df desc, tok asc; idf strictly decreases as df grows
    assert(got.sortBy(g => (-g._2, g._1)).toSeq == got.toSeq)
    got.sliding(2).foreach { case Array(a, b) =>
      if (a._2 > b._2) assert(a._4 < b._4)
      case _ => ()
    }
  }

  test("r_bm25_topk matches a scalar BM25 and prefers the rare term") {
    val ds = docs
    val nd = ds.size.toDouble
    val ntok = ds.map(_._2.length.toLong).sum.toDouble
    val avgdl = ntok / nd
    val dfT = terms.map(t => t -> ds.count(_._2.contains(t)).toDouble).toMap
    def score(toks: Array[String]): BigDecimal = {
      val dl = toks.length.toDouble
      val s = terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        val idf = math.log((nd - dfT(t) + 0.5) / (dfT(t) + 0.5) + 1)
        idf * (tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))
      }.sum
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val want = ds.map { case (id, toks) => (id, score(toks), toks.length.toLong) }
      .sortBy { case (id, s, _) => (-s, id) }
      .take(20).zipWithIndex
      .map { case ((id, s, dl), i) => ((i + 1).toLong, id, s.toDouble, dl) }
    val got = queries.RetrievalOps.set.queries("r_bm25_topk")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(got == want)
    // "dup" appears in ~5% of docs: every top-20 hit must contain it
    // (its idf dwarfs the common terms')
    val byId = ds.toMap
    got.foreach { case (_, id, _, _) => assert(byId(id).contains("dup")) }
  }

  test("r_hybrid_rrf fuses both legs and ranks by the exact RRF weight") {
    val got = queries.RetrievalOps.set.queries("r_hybrid_rrf")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getDouble(4))).toSeq
    assert(got.size == 10 && got.map(_._1) == (1L to 10L))
    // the fused weight is exactly the recomputed 1/(60+r) sum, and the
    // list is sorted by it
    got.foreach { case (_, _, rl, rd, w) =>
      val expect = rl.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        rd.map(r => 1.0 / (60 + r)).getOrElse(0.0)
      assert(math.abs(w - expect) < 1e-6)
      assert(rl.isDefined || rd.isDefined)
    }
    assert(got.map(_._5) == got.map(_._5).sorted(Ordering[Double].reverse))
    // the query vector's own id must win the dense leg (cos = 1)
    val vec7 = got.find(_._2 == 7L)
    assert(vec7.exists(_._4.contains(1L)))
  }
}
