package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** t_stratified_sample's two-phase shape (per-partition bounded heaps
  * → exact rank over the candidates) must return exactly what a plain
  * full-shuffle row_number window returns: any global per-source
  * top-k row is a top-k row of its input partition, so phase 1 may
  * drop no winner — across partition counts, skewed sources, and
  * groups smaller than k. */
class StratifiedSampleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private def reference(sfDir: String): Seq[(Long, String, Long)] = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(col("h"), col("doc_id"))
    Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"),
        ((col("doc_id") % 2147483647L) * 2654435761L % 4294967296L).as("h"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 50)
      .select("doc_id", "source", "rk")
      .orderBy("source", "rk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
  }

  test("two-phase sampler equals the full-window reference on sf0.001") {
    val sfDir = "/root/testdata/sf0.001"
    val got = queries.TextOps.set.queries("t_stratified_sample")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val want = reference(sfDir)
    assert(got.nonEmpty)
    assert(got == want)
  }

  test("skewed synthetic input: tiny groups, one giant group, many partitions") {
    import spark.implicits._
    // source "big" holds 5000 docs, "one" holds 1, "small" holds 7 —
    // exercises quota > group size and heap eviction, over 13
    // partitions so phase 1 emits candidates from many tasks
    val rows =
      (0L until 5000L).map(i => (i, "big")) ++
      Seq((9000L, "one")) ++
      (9100L until 9107L).map(i => (i, "small"))
    val df = spark.createDataset(
      spark.sparkContext.parallelize(rows.toSeq, 13)).toDF("doc_id", "source")
    df.createOrReplaceTempView("documents_synth")

    import org.apache.spark.sql.expressions.Window
    val h = (col("doc_id") % 2147483647L) * 2654435761L % 4294967296L
    val w = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
    val want = df.select(col("doc_id"), col("source"), h.as("h"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 50)
      .select("doc_id", "source", "rk").orderBy("source", "rk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

    val k = 50
    val ord = implicitly[Ordering[(Long, Long)]].reverse
    val partial = df.select(col("doc_id"), col("source"), h.as("h"))
      .as[(Long, String, Long)]
      .mapPartitions { it =>
        val heaps = scala.collection.mutable.Map.empty[String, java.util.PriorityQueue[(Long, Long)]]
        it.foreach { case (id, src, hh) =>
          val q = heaps.getOrElseUpdate(src,
            new java.util.PriorityQueue[(Long, Long)](k + 1, ord))
          if (q.size < k) q.add((hh, id))
          else if (ord.compare((hh, id), q.peek()) > 0) { q.poll(); q.add((hh, id)) }
        }
        heaps.iterator.flatMap { case (src, q) =>
          scala.jdk.CollectionConverters.IteratorHasAsScala(q.iterator).asScala
            .map(t => (t._2, src, t._1))
        }
      }.toDF("doc_id", "source", "h")
    val got = partial
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select("doc_id", "source", "rk").orderBy("source", "rk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

    assert(got == want)
    assert(got.count(_._2 == "big") == 50)
    assert(got.count(_._2 == "one") == 1)
    assert(got.count(_._2 == "small") == 7)
  }

  test("hash-sample bucket formula stays exact for large ids") {
    import spark.implicits._
    // ids near Long.MaxValue: the pre-mod keeps the product < 2^63
    val big = Seq(Long.MaxValue - 1, Long.MaxValue / 2, 4294967296L * 12345L + 678L)
    val got = big.toDF("doc_id")
      .select(((col("doc_id") % 2147483647L) * 2654435761L % 4294967296L).as("bucket"))
      .collect().map(_.getLong(0)).toSeq
    val want = big.map(id => ((id % 2147483647L) * 2654435761L) % 4294967296L)
    assert(got == want)
    assert(got.forall(b => b >= 0L && b < 4294967296L))
  }
}
