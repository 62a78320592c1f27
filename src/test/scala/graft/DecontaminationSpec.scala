package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.DedupOps

/** Train/eval n-gram decontamination: the overlap scan must find
  * exactly the corpus docs sharing a word n-gram with the eval set,
  * count DISTINCT contaminated grams per doc, and keep its 100 TB
  * plan shape — broadcast the (small) eval gram set and never shuffle
  * the corpus before the semi-join probe.
  */
class DecontaminationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def df(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // corpus: doc 1 contains the planted eval trigram "q r s" twice (the
  // repeat must count ONCE — distinct grams), doc 2 contains a
  // different eval trigram, doc 3 shares words but no full trigram,
  // doc 4 is shorter than n and must emit nothing.
  private val corpus = Seq(
    (1L, "a b q r s c q r s d"),
    (2L, "x y z t u v"),
    (3L, "q s r t r q"),
    (4L, "q r"))
  private val eval = Seq(
    (100L, "p q r s"),   // grams: "p q r", "q r s"
    (101L, "t u v"))     // gram: "t u v"

  private def run(broadcastEval: Boolean): Map[Long, Long] =
    DedupOps.decontaminate(df(corpus), df(eval), "doc_id", "text",
        n = 3, broadcastEval = broadcastEval)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("finds exactly the overlapping docs, distinct grams per doc") {
    assert(run(broadcastEval = true) == Map(1L -> 1L, 2L -> 1L))
  }

  test("shuffled-semi variant (eval too big to broadcast) agrees") {
    assert(run(broadcastEval = false) == Map(1L -> 1L, 2L -> 1L))
  }

  test("wordGrams: positions, repeats kept, short docs empty") {
    val g = DedupOps.wordGrams(df(Seq((7L, "a b a b a"), (8L, "a b"))),
        "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(g == Seq((7L, "a b a"), (7L, "b a b"), (7L, "a b a")))
  }

  test("wordGrams: null text rows emit nothing, not an NPE") {
    import spark.implicits._
    val withNull = Seq((1L, Some("a b c")), (2L, None))
      .toDF("doc_id", "text")
    val g = DedupOps.wordGrams(withNull, "doc_id", "text", n = 2)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(g == Seq((1L, "a b"), (1L, "b c")))
  }

  test("wordGrams ≡ local sliding-window reference on random text") {
    import org.scalacheck.Gen
    // words over a tiny alphabet plus empty tokens (double spaces) —
    // the split(" ", -1) semantics the oracle's string_split shares
    val word = Gen.oneOf("a", "bb", "ccc", "")
    val doc = Gen.chooseNum(0, 9).flatMap(k => Gen.listOfN(k, word)).map(_.mkString(" "))
    val docs = Gen.listOfN(40, doc).sample.get.zipWithIndex
      .map { case (txt, i) => (i.toLong, txt) }
    def ref(text: String, n: Int): Seq[String] =
      text.split(" ", -1).toSeq.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
    for (n <- Seq(2, 3)) {
      val got = DedupOps.wordGrams(df(docs), "doc_id", "text", n)
        .collect().map(r => (r.getLong(0), r.getString(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
      val want = docs.map { case (id, txt) => id -> ref(txt, n).sorted }
        .filter(_._2.nonEmpty).toMap
      assert(got == want, s"n=$n")
    }
  }

  test("broadcast plan: eval side broadcast, corpus probe not shuffled") {
    val plan = DedupOps.decontaminate(df(corpus), df(eval), "doc_id", "text",
        n = 3, broadcastEval = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected broadcast left-semi probe:\n$plan")
    // the corpus gram stream (the join's left branch, printed between
    // the BroadcastHashJoin line and its BroadcastExchange child) must
    // reach the semi-join without an exchange — it is probed map-side;
    // the tiny eval distinct inside the broadcast subtree may shuffle
    val joinIdx = plan.indexOf("BroadcastHashJoin")
    val corpusBranch = plan.substring(joinIdx, plan.indexOf("BroadcastExchange", joinIdx))
    assert(!corpusBranch.contains("Exchange"),
      s"corpus side shuffled below the semi-join:\n$plan")
  }
}
