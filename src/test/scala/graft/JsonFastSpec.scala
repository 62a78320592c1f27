package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.JsonFast

/** JsonGetSimple / FastJsonRule: the fast scan must agree with Spark's
  * built-in get_json_object on every input — by matching it directly
  * on the cases it fast-paths, and by BAILing to the built-in on every
  * case it cannot prove. */
class JsonFastSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    // getOrCreate may reuse another suite's session, where builder
    // extensions never applied — use the runtime install path (also
    // the path a library user takes on an existing session)
    graft.plans.FastJsonRule.install(s)
    s
  }

  private val cases: Seq[String] = Seq(
    """{"k": 69}""",
    """{"k":-12, "x": 3}""",
    """{"x": 1, "k": 2}""",
    """{"k": "plain string"}""",
    """{"k": true}""",
    """{"k": false}""",
    """{"k": null}""",                       // bail: null semantics
    """{"k": 1.5}""",                        // bail: float
    """{"k": 1e3}""",                        // bail: exponent
    """{"k": {"a": 1}}""",                   // bail: object result
    """{"k": [1, 2, 3]}""",                  // bail: array result
    """{"k": "with \"escape\""}""",          // bail: escaped value
    """{"other": 1}""",                      // absent -> null
    """{}""",                                // empty -> null
    """{"nested": {"k": 99}, "k": 7}""",     // depth-1 only
    """{"arr": [{"k": 1}], "k": 8}""",
    """{"k": 1, "k": 2}""",                  // bail: duplicate key
    """not json at all""",                   // bail: malformed
    """[1, 2, 3]""",                         // bail: non-object root
    """   {"k": 42}   """,                   // surrounding whitespace
    """{"k":"unicode é"}""",            // bail: escape
    """{"k": 017}""",                        // bail: leading zero (malformed)
    """{"kk": 1, "k": 2}""",                 // near-miss key name
    """{"K": 1}""",                          // case-sensitive miss -> null
    "",                                      // bail/empty
    """{"k": ""}"""                          // empty string value
  )

  test("fast scan agrees with the built-in on scalars and bails on the rest") {
    import org.apache.spark.sql.catalyst.expressions.{GetJsonObject, Literal}
    val k = UTF8String.fromString("k")
    cases.foreach { js =>
      // ground truth: Spark's own expression, evaluated directly (a
      // second SparkSession would reuse the extension-laden context)
      val expected = Option(
        GetJsonObject(Literal.create(js, org.apache.spark.sql.types.StringType),
          Literal.create("$.k", org.apache.spark.sql.types.StringType))
          .eval(null)).map(_.toString).orNull
      val fast = JsonFast.extract(UTF8String.fromString(js), k)
      val got =
        if (fast eq JsonFast.BAIL) new graft.functions.JsonFallback("k")(UTF8String.fromString(js))
        else fast
      val gotStr = if (got == null) null else got.toString
      assert(gotStr == expected, s"mismatch on <$js>: fast=$gotStr builtin=$expected")
    }
  }

  test("property: fast scan + fallback == built-in on random JSON documents") {
    import org.scalacheck.Gen
    import org.apache.spark.sql.catalyst.expressions.{GetJsonObject, Literal}
    import org.apache.spark.sql.types.StringType

    val keyGen = Gen.oneOf("k", "key_2", "K", "nested", "kk")
    val scalarGen: Gen[String] = Gen.oneOf(
      Gen.choose(-1000000L, 1000000L).map(_.toString),
      Gen.choose(-1e6, 1e6).map(d => f"$d%.3f"),
      Gen.oneOf("true", "false", "null"),
      Gen.alphaNumStr.map(s => "\"" + s.take(12) + "\""),
      Gen.const("\"esc\\\"aped\\\\x\""),
      Gen.const("\"unicode\\u00e9\""),
      Gen.const("1e5"), Gen.const("0.5"), Gen.const("007"))
    def valueGen(depth: Int): Gen[String] =
      if (depth <= 0) scalarGen
      else Gen.frequency(
        6 -> scalarGen,
        1 -> Gen.listOfN(2, valueGen(depth - 1)).map(_.mkString("[", ",", "]")),
        1 -> objGen(depth - 1))
    def objGen(depth: Int): Gen[String] =
      Gen.choose(0, 4).flatMap(n =>
        Gen.listOfN(n, for { k <- keyGen; v <- valueGen(depth) } yield s""""$k": $v""")
          .map(_.mkString("{", ", ", "}")))
    val docGen: Gen[String] = Gen.frequency(
      8 -> objGen(2),
      1 -> Gen.const("not json"),
      1 -> Gen.const("[1,2]"))

    val k = UTF8String.fromString("k")
    val fb = new graft.functions.JsonFallback("k")
    val docs = Gen.listOfN(500, docGen).sample.getOrElse(Seq.empty)
    assert(docs.nonEmpty)
    docs.foreach { js =>
      val expected = Option(
        GetJsonObject(Literal.create(js, StringType), Literal.create("$.k", StringType))
          .eval(null)).map(_.toString).orNull
      val fast = JsonFast.extract(UTF8String.fromString(js), k)
      val got = if (fast eq JsonFast.BAIL) fb(UTF8String.fromString(js)) else fast
      val gotStr = if (got == null) null else got.toString
      assert(gotStr == expected, s"mismatch on <$js>: fast=$gotStr builtin=$expected")
    }
  }

  test("optimizer rule rewrites simple literal paths and leaves complex ones") {
    // non-foldable input (a literal would constant-fold into a
    // LocalRelation before the plan can be inspected)
    val df = spark.range(1, 2)
      .selectExpr("""concat('{"k": ', id, ', "a": {"b": ', id + 1, '}}') AS j""")
    val simple = df.selectExpr("get_json_object(j, '$.k') AS v")
    assert(simple.queryExecution.optimizedPlan.toString.contains("json_get_simple"))
    assert(simple.collect()(0).getString(0) == "1")
    val complex = df.selectExpr("get_json_object(j, '$.a.b') AS v")
    assert(!complex.queryExecution.optimizedPlan.toString.contains("json_get_simple"))
    assert(complex.collect()(0).getString(0) == "2")
    // codegen path end-to-end over a real column (f_json shape)
    val many = spark.range(0, 1000)
      .selectExpr("""concat('{"k": ', id, '}') AS j""")
      .selectExpr("CAST(get_json_object(j, '$.k') AS BIGINT) AS k")
    assert(many.agg(sum("k")).collect()(0).getLong(0) == (0L until 1000L).sum)
  }

  test("extensions inject the custom function surface for SQL sessions") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    // getOrCreate may have reused a session built without extensions
    // (suite ordering); only a session the builder actually
    // constructed proves injection — otherwise the register() path is
    // the contract (covered by VecDotSpec / VortexZOrderSpec).
    if (spark.sessionState.functionRegistry.functionExists(FunctionIdentifier("z_value"))) {
      assert(spark.sql("SELECT z_value(1L, 2L) AS z").head().getAs[Array[Byte]]("z").length == 16)
      assert(spark.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .head().getDouble(0) == 11.0)
      assert(spark.sql("SELECT double_sortable_bits(0.0d) AS b").head().getLong(0) == 0L)
    }
  }
}
