package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VecDot

class VecDotSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  test("vec_dot matches the aggregate/zip_with formulation and runs codegen'd") {
    VecDot.register(spark)
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS e")
    val both = df.selectExpr(
      "vec_id",
      "vec_dot(e, e) AS fast",
      "aggregate(zip_with(e, e, (x, y) -> x * y), 0D, (acc, v) -> acc + v) AS ref")
    assert(both.filter(abs(col("fast") - col("ref")) > 1e-9).count() == 0)
    // null semantics: null array → null result
    val n = spark.sql("SELECT vec_dot(CAST(NULL AS ARRAY<DOUBLE>), array(CAST(1.0 AS DOUBLE))) AS d")
    assert(n.head().isNullAt(0))
    // vec_dot alone stays inside WholeStageCodegen ("*(n)" markers);
    // the reference formulation (higher-order aggregate) cannot.
    val solo = df.selectExpr("vec_id", "vec_dot(e, e) AS fast")
      .queryExecution.executedPlan.toString
    assert(solo.linesIterator.exists(l => l.contains("*(") && l.contains("vecdot")), solo)
  }

  test("quantizeOne fast path is bit-identical to the BigDecimal form (r13)") {
    import graft.functions.VecFixedPoint
    def slow(x: Float): Long =
      java.math.BigDecimal.valueOf(x.toDouble)
        .setScale(8, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
    // adversarial values: exact ties, signs, zeros, subnormals, large
    val edge = Seq(0f, -0f, 1e-9f, -1e-9f, 5e-9f, -5e-9f, 1.5e-8f,
      0.5f, -0.5f, 0.000000015f, 0.1f, -0.1f, 0.60000001f,
      123.456789f, -123.456789f, 1e7f, -1e7f, 1.4e-45f, -1.4e-45f,
      0.12345678f, 0.123456785f, -0.123456785f)
    edge.foreach { x =>
      assert(VecFixedPoint.quantizeOne(x) == slow(x), s"edge $x")
    }
    // 2M seeded random floats over the embedding range and beyond
    val rnd = new scala.util.Random(13)
    var i = 0
    while (i < 2000000) {
      val x = ((rnd.nextDouble() - 0.5) *
        (if (i % 3 == 0) 1.2 else if (i % 3 == 1) 2e4 else 2e9)).toFloat
      assert(VecFixedPoint.quantizeOne(x) == slow(x),
        s"mismatch at $x (iter $i)")
      i += 1
    }
  }

  test("vec_dot top-k ANN scoring plan: broadcast + codegen") {
    VecDot.register(spark)
    val v = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS e")
    val q = v.filter("vec_id < 3")
    val scored = v.as("c").join(broadcast(q.as("q")), expr("q.vec_id <> c.vec_id"))
      .selectExpr("q.vec_id AS id_q", "c.vec_id AS id_n", "vec_dot(q.e, c.e) AS dot")
    assert(scored.count() == 3 * 499)
    assert(scored.filter("dot IS NULL").count() == 0)
  }
}
