package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Edge cases of the t_repetition per-document kernel that the
  * synthetic corpus (uniform ~30-70-word docs) never exercises:
  * single-word docs (no bigrams), a fully repeated doc, and the
  * agreement of the count columns with their definitions.
  */
class TextRepetitionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def run(rows: Seq[(Long, String)]): Map[Long, (Long, Long, Long, Long)] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rep").toString
    rows.toDF("doc_id", "text").withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("t"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    graft.queries.TextOps.set.queries("t_repetition")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
  }

  test("single word, full repetition, and mixed docs") {
    val out = run(Seq(
      (1L, "alone"),                  // 1 word, 0 bigrams, top 0
      (2L, "a a a a"),                // 4 words, 1 distinct, bigram "a a" x3
      (3L, "x y x y z")))             // bigrams: "x y" x2, "y x", "y z"
    assert(out(1L) == ((1L, 1L, 0L, 0L)))
    assert(out(2L) == ((4L, 1L, 1L, 3L)))
    assert(out(3L) == ((5L, 3L, 3L, 2L)))
  }
}
