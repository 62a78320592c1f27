package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.DedupOps

/** The dedup kernels must be shuffle-formulated (no driver-side
  * O(corpus) state) AND agree with the small-corpus driver kernel on
  * both physical strategies of the exact Jaccard join (prefix-filter
  * join for zipfian vocabularies, block join for template corpora
  * where nothing prunes).
  */
class DedupScaleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def toks(docs: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))
  }

  private def pairs(df: DataFrame): Set[(Long, Long, Double)] =
    df.select("id_a", "id_b", "jac").collect()
      .map(r => (r.getLong(0), r.getLong(1), math.rint(r.getDouble(2) * 1e9) / 1e9)).toSet

  // template corpus: tiny vocabulary, heavy overlap → block-join branch
  private val template: Seq[(Long, String)] = (0L until 40L).map { i =>
    val words = (0 until 8).map(j => s"w${(i + j) % 12}")
    (i, words.mkString(" "))
  } ++ Seq((40L, "w0 w1 w2 w3 w4 w5 w6 w7"))

  // zipf-ish corpus: wide vocabulary, rare tokens prune → prefix branch
  private val zipfish: Seq[(Long, String)] = (0L until 40L).map { i =>
    val rare = s"rare_$i"
    val shared = if (i % 2 == 0) "alpha beta" else "alpha gamma"
    val near = if (i % 10 == 0) s"rare_${i + 1} extra" else s"uniq_$i only_$i"
    (i, s"$shared $rare $near")
  }

  test("jaccard shuffle join ≡ driver kernel (block-join branch)") {
    val t = toks(template)
    assert(pairs(DedupOps.jaccardDocPairs(spark, t, 0.5)) ==
           pairs(DedupOps.jaccardDocPairsKernel(spark, t, 0.5)))
  }

  test("jaccard shuffle join ≡ driver kernel (prefix branch)") {
    val t = toks(zipfish)
    for (tau <- Seq(0.3, 0.6)) {
      assert(pairs(DedupOps.jaccardDocPairs(spark, t, tau)) ==
             pairs(DedupOps.jaccardDocPairsKernel(spark, t, tau)),
        s"mismatch at tau=$tau")
    }
  }

  test("jaccardDocPairsAuto dispatches and agrees") {
    val t = toks(template)
    val expect = pairs(DedupOps.jaccardDocPairsKernel(spark, t, 0.5))
    assert(pairs(DedupOps.jaccardDocPairsAuto(spark, t, 0.5, maxKernelSets = 4)) == expect)
    assert(pairs(DedupOps.jaccardDocPairsAuto(spark, t, 0.5, maxKernelSets = 4096)) == expect)
    assert(pairs(DedupOps.jaccardDocPairsAuto(spark, t, 0.5, maxKernelSets = 0)) == expect)
  }

  test("minhashNearDup = LSH candidates verified by exact Jaccard") {
    val t = toks(template)
    val exact = pairs(DedupOps.jaccardDocPairs(spark, t, 0.5)).map(p => (p._1, p._2))
    val lsh = pairs(DedupOps.minhashNearDup(spark, t, 0.5)).map(p => (p._1, p._2))
    // LSH-verified pairs are a subset of the exact join (recall < 1,
    // precision 1 after verification)
    assert(lsh.subsetOf(exact))
    // identical docs always collide (equal signatures) → recall 1 there
    val dup = exact.filter(p => template.toMap.apply(p._1) == template.toMap.apply(p._2))
    assert(dup.subsetOf(lsh))
  }

  test("dedup query paths contain no O(corpus) driver collect") {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/queries/DedupOps.scala")))
    // collect() may appear ONLY inside the two explicitly size-gated
    // driver kernels: distinctSetsOf (the jaccard kernel representation)
    // and labelPropagateKernel. None of the shuffle paths
    // (distinctSetsDF, jaccardDocPairs, blockJoin, minhashCandidates,
    // minhashNearDup, labelPropagate) may collect.
    val stripped = src.replaceAll("(?s)/\\*.*?\\*/", "")
    val hits = java.util.regex.Pattern.quote(".collect()").r
      .findAllIn(stripped).size
    // 5 gated sites: distinctSetsOf (kernel-only wrapper),
    // labelPropagateKernel wrapper + kernel-core ids collect,
    // labelPropagateAuto's limit(cap+1)-bounded probe,
    // jaccardDocPairsAuto's limit(cap+1)-bounded probe-and-input
    // collect (round 5: the probe IS the kernel input, one aggregation
    // instead of two). finishIncremental's former per-batch collect is
    // gone (round 8): it materializes via eager localCheckpoint, so
    // the per-batch result never round-trips the driver.
    assert(hits == 5, s"expected exactly 5 gated collect() in DedupOps, found $hits")
    def bodyOf(defName: String): String = {
      val b = src.substring(src.indexOf(s"def $defName"))
      b.take(b.indexOf("\n  }"))
    }
    assert(bodyOf("distinctSetsOf").contains(".collect()"))
    // kernel collects: the unbounded wrapper (spec-only), the ids
    // collect in the kernel core, and labelPropagateAuto's
    // limit(cap+1)-BOUNDED collect (explicitly capped driver rows)
    assert(bodyOf("labelPropagateKernel(").contains(".collect()"))
    assert(bodyOf("labelPropagateKernelEdges").contains(".collect()"))
    assert(bodyOf("labelPropagateAuto").contains("limit(maxKernelPairs + 1)"))
    assert(bodyOf("jaccardDocPairsAuto").contains("limit(maxKernelSets + 1)"))
    // and the distributed labelPropagate stays shuffle-only
    assert(!bodyOf("labelPropagate(").contains(".collect()"))
    // round 8: finishIncremental materializes via localCheckpoint —
    // no driver round-trip of the per-batch result
    assert(!bodyOf("finishIncremental").contains(".collect()"))
    assert(bodyOf("finishIncremental").contains("localCheckpoint"))
  }

  test("labelPropagateAuto ≡ distributed labelPropagate") {
    import spark.implicits._
    val docs = (0L until 20L).toDF("doc_id")
    // a path 0-1-2-3-4 (diameter > 4 resolves only partially — the
    // kernel must replicate the bounded-round semantics, not full CC),
    // a triangle, an isolated clique pair, and singletons
    val es = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L), (11L, 12L), (10L, 12L), (15L, 16L)).toDF("id_a", "id_b")
    for (rounds <- Seq(1, 2, 4)) {
      val dist = DedupOps.labelPropagate(docs, es, rounds)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val kern = DedupOps.labelPropagateKernel(spark, docs, es, rounds)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val auto = DedupOps.labelPropagateAuto(spark, docs, es, rounds)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(kern == dist, s"kernel mismatch at rounds=$rounds")
      assert(auto == dist, s"auto mismatch at rounds=$rounds")
    }
  }

  test("labelPropagate kernel preserves the caller's doc_id type; pair bound routes to distributed") {
    import spark.implicits._
    val docs = spark.range(0, 6).selectExpr("CAST(id AS INT) AS doc_id")
    val es = Seq((0, 1), (2, 3)).toDF("id_a", "id_b")
    val dist = DedupOps.labelPropagate(docs, es, 2)
    val auto = DedupOps.labelPropagateAuto(spark, docs, es, 2)
    // auto takes the kernel here — its output schema must match the
    // distributed path exactly (int doc_id stays int)
    assert(auto.schema.map(_.dataType) == dist.schema.map(_.dataType))
    // a pair frame over the kernel bound must fall back to the
    // distributed rounds (observable: same result, no driver collect of
    // the pairs — proven by agreeing with labelPropagate on the data)
    val many = DedupOps.labelPropagateAuto(spark, docs, es, 2, maxKernelPairs = 1)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(many == dist.collect().map(r => (r.getInt(0), r.getInt(1))).toSet)
  }

  test("packed minhash candidates fail fast on out-of-range doc ids") {
    import spark.implicits._
    val tok = Seq((1L << 31, "a"), ((1L << 31) + 1, "a"))
      .toDF("doc_id", "w")
    val e = intercept[org.apache.spark.SparkException] {
      DedupOps.minhashCandidatesPacked(spark, tok).collect()
    }
    def root(t: Throwable): Throwable = if (t.getCause == null) t else root(t.getCause)
    assert(root(e).getMessage.contains("outside packed range"))
  }
}
