package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** FastRegexCountRule / TextScan kernels: the byte-scan rewrites of
  * literal-pattern regexp_count must be bit-equal to the java regex
  * engine on adversarial inputs, fire only on provable patterns, and
  * actually appear in the optimized plan. */
class TextScanSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    graft.plans.FastRegexCountRule.install(s)
    s
  }

  // inputs chosen to stress find() semantics: shared-prefix branches
  // ("a" vs "and"), boundaries at string edges, '_' and digits as word
  // chars, punctuation boundaries, unicode neighbors, overlaps
  private val adversarial = Seq(
    "the a of and to",
    "and", "a", "", "  ",
    "theater together a_the the_ _the 9the the9",
    "a-and.of,to;the(and)of[a]",
    "ananas and-and anda and_and and and",
    "汉字the汉and字 el汉la",
    "to to to toto o t ot",
    "The A OF And tO",           // case-sensitive: must NOT match
    "a|b (a) \\ba\\b",
    "of. of? of! of\nof\tof",
    "aandofto a and of to aand ofto")

  private val patterns = Seq(
    "\\b(the|a|of|and|to)\\b",
    "\\b(a|and)\\b",             // prefix branch shadows longer one
    "\\b(and|a)\\b",
    "\\bthe\\b",
    "\\b(el|la|de|los)\\b",
    "[\\x{4e00}-\\x{9fff}]",
    "[\\x{61}-\\x{7a}]",
    // class-alternation family (ClassAltCount)
    "[a-z]+|[0-9]+|[^a-z0-9\\s]",
    "[a-z]+",
    "[0-9]",
    "[^a-z]",                    // negated: must count unicode chars too
    "[abc]+|[x-z]",
    "[a-]",                      // '-' as a literal member
    "[\\d]+|[\\s]")

  test("byte-scan counts equal regexp_count on adversarial inputs") {
    import spark.implicits._
    val df = adversarial.toDF("t")
    patterns.foreach { p =>
      // builtin answer computed WITHOUT the rule: call the kernel vs
      // java.util.regex directly per row for an engine-independent twin
      val expected = adversarial.map { s =>
        var c = 0
        val m = java.util.regex.Pattern.compile(p).matcher(s)
        while (m.find()) c += 1
        c
      }
      val got = df.select(regexp_count(col("t"), lit(p)).cast("int")).as[Int].collect()
      assert(got.toSeq == expected,
        s"pattern $p: got ${got.toSeq} expected $expected")
    }
  }

  test("the rewrite fires on provable patterns and only on them") {
    // range (not a local relation): ConvertToLocalRelation would fold
    // the whole projection away and leave nothing to inspect
    val df = spark.range(1).selectExpr("CAST(id AS STRING) AS t")
    def planOf(p: String): String =
      df.select(regexp_count(col("t"), lit(p))).queryExecution.optimizedPlan.toString
    assert(planOf("\\b(the|a)\\b").contains("word_set_count"))
    assert(planOf("\\bthe\\b").contains("word_set_count"))
    assert(planOf("[\\x{4e00}-\\x{9fff}]").contains("codepoint_range_count"))
    assert(planOf("[a-z]+|[0-9]+|[^a-z0-9\\s]").contains("class_alt_count"))
    // NOT provable: metachars, non-literal branch, case-insensitive flag
    assert(!planOf("\\b(the|a.)\\b").contains("word_set_count"))
    assert(!planOf("the|a").contains("word_set_count"))
    assert(!planOf("(?i)\\b(the)\\b").contains("word_set_count"))
    assert(!planOf("[\\x{4e00}-\\x{9fff}]+").contains("codepoint_range_count"))
    // NOT provable class-alternations: star/optional quantifiers,
    // trailing context, \w (would change on UNICODE flags), nesting,
    // java set-intersection syntax, escape-led ranges
    val unprovable = Seq("[a-z]*", "[a-z]+x", "[\\w]+", "[a-z]+|", "[a-[b]]",
      "[a&&b]", "[a&&[b]]", "[\\t-z]", "[\\t-z]+", "[a-é]")
    unprovable.foreach(p => assert(!planOf(p).contains("class_alt_count"), p))
  }
}
