package graft

import org.scalatest.funsuite.AnyFunSuite

/** The round-8 corpus-statistics trio: sequence packing
  * (t_pack_blocks), unigram-LM scoring (t_unigram_nll), heavy-hitter
  * trigrams (t_top_ngrams). Each is checked against an independent
  * driver-side scalar recompute on sf0.001 plus the invariants that
  * make the operator trustworthy at scale.
  */
class CorpusStatsSpec extends AnyFunSuite {
  lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private def docs: Seq[(Long, String)] =
    Tables.t(spark, sfDir, "documents").select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)

  test("t_pack_blocks matches a sequential scalar packer and tiles the stream") {
    val B = 128L
    var cum = 0L
    val want = docs.map { case (id, text) =>
      val n = text.split(" ", -1).length.toLong
      val start = cum; cum += n
      (id, n, start, start / B, (cum - 1) / B, (cum - 1) / B - start / B + 1)
    }
    val got = queries.TextOps.set.queries("t_pack_blocks")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq
    assert(got == want)
    // tiling: consecutive docs are contiguous in the token stream
    // (start of doc i+1 = start of doc i + its token count), so no
    // token is lost or double-assigned to a block
    got.zip(got.tail).foreach { case ((_, n1, s1, _, _, _), (_, _, s2, _, _, _)) =>
      assert(s2 == s1 + n1)
    }
    // every block span is consistent with the doc's token interval
    got.foreach { case (_, n, s, bf, bl, nb) =>
      assert(bf == s / B && bl == (s + n - 1) / B && nb == bl - bf + 1 && nb >= 1)
    }
  }

  test("t_pack_manifest tiles every block exactly and covers every document") {
    val B = 128L
    val got = queries.TextOps.set.queries("t_pack_manifest")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    val nTokByDoc = docs.map { case (id, t) => id -> t.split(" ", -1).length.toLong }.toMap
    val total = nTokByDoc.values.sum
    // per document: slices cover [0, n_tok) contiguously
    got.groupBy(_._2).foreach { case (id, slices) =>
      val sorted = slices.sortBy(_._3)
      assert(sorted.head._3 == 0L)
      assert(sorted.map(_._4).sum == nTokByDoc(id))
      sorted.zip(sorted.tail).foreach { case (a, b) => assert(b._3 == a._3 + a._4) }
    }
    assert(got.groupBy(_._2).keySet == nTokByDoc.keySet)
    // per block: slices tile [0, B) (last block may be partial)
    val lastBlock = (total - 1) / B
    got.groupBy(_._1).foreach { case (blk, slices) =>
      val sorted = slices.sortBy(_._5)
      assert(sorted.head._5 == 0L)
      sorted.zip(sorted.tail).foreach { case (a, b) => assert(b._5 == a._5 + a._4) }
      val filled = sorted.map(_._4).sum
      if (blk < lastBlock) assert(filled == B)
      else assert(filled == total - lastBlock * B)
    }
    assert(got.groupBy(_._1).keySet == (0L to lastBlock).toSet)
  }

  test("t_unigram_nll matches a driver-side unigram LM to 1e-4") {
    val all = docs.flatMap(_._2.split(" ", -1))
    val freq = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = all.size.toDouble
    val want = docs.map { case (id, text) =>
      val toks = text.split(" ", -1)
      val nll = toks.map(t => -math.log(freq(t) / total)).sum / toks.length
      (id, BigDecimal(nll).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        toks.length.toLong)
    }
    val got = queries.TextOps.set.queries("t_unigram_nll")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .toSeq
    assert(got == want)
    // nll is bounded below by the most-common token's self-information
    // (no document can look MORE probable than all-most-common-token)
    val pMax = freq.values.max / total
    assert(got.forall(_._2 >= -math.log(pMax) - 1e-4))
    assert(got.forall(r => r._2 > 0.0))
  }

  test("t_source_kl matches a scalar KL computation and is non-negative") {
    val bySrc = Tables.t(spark, sfDir, "documents").select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq.groupBy(_._1)
    val counts = bySrc.view.mapValues { ds =>
      val m = scala.collection.mutable.Map.empty[String, Long]
      ds.foreach(_._2.split(" ", -1).foreach(t => m(t) = m.getOrElse(t, 0L) + 1L))
      m.toMap
    }.toMap
    val corpus = counts.values.flatten
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val nC = corpus.values.sum.toDouble
    val want = counts.toSeq.sortBy(_._1).map { case (src, m) =>
      val nS = m.values.sum.toDouble
      val kl2 = m.map { case (t, c) =>
        (c / nS) * math.log((c / nS) / (corpus(t) / nC))
      }.sum
      (src, nS.toLong, m.size.toLong,
        BigDecimal(kl2).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = queries.TextOps.set.queries("t_source_kl")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // doubles: summation order differs between the scalar fold and the
    // distributed partial aggregation — compare at the rounding grid
    assert(got.map(g => (g._1, g._2, g._3)) == want.map(w => (w._1, w._2, w._3)))
    got.zip(want).foreach { case (g, w) => assert(math.abs(g._4 - w._4) <= 2e-6) }
    got.foreach(g => assert(g._4 >= -1e-9))  // KL >= 0
  }

  test("t_split_assign is deterministic, complete, and near 80/10/10") {
    val got = queries.TextOps.set.queries("t_split_assign")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val total = got.map(_._3).sum
    assert(total == docs.size)
    val bySplit = got.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(math.abs(bySplit("train").toDouble / total - 0.8) < 0.08)
    assert(math.abs(bySplit.getOrElse("val", 0L).toDouble / total - 0.1) < 0.06)
    assert(math.abs(bySplit.getOrElse("test", 0L).toDouble / total - 0.1) < 0.06)
    // stability: the assignment is a pure function of doc_id, so the
    // same docs get the same split when the corpus grows (recompute
    // the formula over a half-corpus and the full corpus)
    def split(id: Long): String = {
      val b = (id % 2147483647L) * 2654435761L % 4294967296L
      if (b < 3435973837L) "train" else if (b < 3865470566L) "val" else "test"
    }
    val half = docs.take(docs.size / 2).map { case (id, _) => id -> split(id) }
    val full = docs.map { case (id, _) => id -> split(id) }.toMap
    half.foreach { case (id, sp) => assert(full(id) == sp) }
  }

  test("t_top_ngrams matches an exact scalar trigram count with the deterministic cut") {
    val counts = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (_, text) =>
      val toks = text.split(" ", -1)
      var i = 0
      while (i + 3 <= toks.length) {
        val g = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
        counts(g) = counts.getOrElse(g, 0L) + 1L
        i += 1
      }
    }
    val want = counts.toSeq
      .sortBy { case (g, c) => (-c, g) }
      .take(20)
      .zipWithIndex
      .map { case ((g, c), i) => ((i + 1).toLong, g, c) }
    val got = queries.TextOps.set.queries("t_top_ngrams")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
    assert(got == want)
    assert(got.map(_._3) == got.map(_._3).sorted(Ordering[Long].reverse))
  }
}
