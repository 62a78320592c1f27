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
    "aandofto a and of to aand ofto",
    // \b unicode adjacency: java's Bound decodes codepoints even in
    // non-UNICODE_CHARACTER_CLASS mode — CJK/accented letters are
    // word chars, so 汉the / éthe must NOT match \bthe\b
    "éthe theé é the é",
    "汉the the汉 汉 the 汉",
    // combining marks: NSM with a letter base extends the word
    // (áthe has no boundary before t; thé has none after e)
    "áthe thé ́the .́the ́́the",
    // supplementary neighbors: 𝕒 (U+1D552, a letter) blocks the
    // boundary; the surrogate quirk in hasBaseCharacter
    "𝕒the the𝕒 𝕒́the",
    // supplementary NSM (U+1D17B) directly adjacent
    "the𝅻 𝅻the a𝅻the")

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
    // RDD-backed, NOT a LocalRelation: ConvertToLocalRelation would
    // constant-fold the projection with the builtin regex before the
    // User Provided Optimizers batch runs and the kernels would never
    // execute (the unicode-\b divergence hid exactly this way)
    val df = spark.createDataset(spark.sparkContext.parallelize(adversarial, 2)).toDF("t")
    patterns.foreach { p =>
      // expected answer from java.util.regex directly per row — an
      // engine-independent twin of the builtin's semantics
      val expected = adversarial.map { s =>
        var c = 0
        val m = java.util.regex.Pattern.compile(p).matcher(s)
        while (m.find()) c += 1
        c
      }
      val q = df.select(regexp_count(col("t"), lit(p)).cast("int"))
      // prove non-vacuity: the kernels must actually be in the plan
      // for every provable pattern (all of `patterns` are provable)
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("word_set_count") ||
             optimized.contains("codepoint_range_count") ||
             optimized.contains("class_alt_count"),
        s"pattern $p: kernel did not fire; plan:\n$optimized")
      val got = q.as[Int].collect()
      assert(got.toSeq == expected,
        s"pattern $p: got ${got.toSeq} expected $expected")
    }
  }

  test("fuzz: countWordSet equals java.util.regex over a boundary-stressing alphabet") {
    import org.apache.spark.unsafe.types.UTF8String
    // every \b-relevant category: ASCII word/non-word, accented and
    // CJK letters, BMP NSM (U+0301), supplementary letter (U+1D552),
    // supplementary NSM (U+1D17B)
    val alphabet = Array("a", "t", "h", "e", "n", "d", " ", ".", "_", "9",
      "é", "汉", "́", "𝕒", "𝅻")
    val words = Seq("the", "a", "and", "to")
    val wordBytes = words.map(_.getBytes("UTF-8")).toArray
    val pat = java.util.regex.Pattern.compile("\\b(the|a|and|to)\\b")
    val rnd = new scala.util.Random(42)
    var k = 0
    while (k < 4000) {
      val s = (0 until rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      var expected = 0
      val m = pat.matcher(s)
      while (m.find()) expected += 1
      val got = graft.functions.TextScan.countWordSet(UTF8String.fromString(s), wordBytes)
      assert(got == expected,
        s"input ${s.map(c => f"\\u$c%04x").mkString} ('$s'): kernel $got engine $expected")
      k += 1
    }
  }

  test("spaceTokenStats equals split(' ', -1) semantics on adversarial inputs (r13)") {
    import graft.functions.TextScan
    import org.apache.spark.unsafe.types.UTF8String
    val words = Array("the", "a", "naïve", "", "日本")
    val wordBytes = words.map(_.getBytes("UTF-8"))
    def slow(text: String): Array[Long] = {
      val toks = text.split(" ", -1)
      Array(toks.length.toLong) ++ words.map(w => toks.count(_ == w).toLong)
    }
    val cases = Seq(
      "", " ", "  ", "the", "the the", " the ", "a  a", "thethe the",
      "naïve the naïve", "日本 the 日本語", "the\tthe", "a a a a a ",
      " leading", "trailing ", "th e", "a a", "🎉 the 🎉", "éé the")
    cases.foreach { t =>
      assert(TextScan.spaceTokenStats(UTF8String.fromString(t), wordBytes)
        .sameElements(slow(t)), s"case '$t'")
    }
    // seeded fuzz over a boundary-stressing alphabet
    val rnd = new scala.util.Random(7)
    val alphabet = Seq("the", "a", "naïve", "x", "", " ", "日本", "🎉", "th")
    (0 until 2000).foreach { i =>
      val t = (0 until rnd.nextInt(30)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString(" ")
      assert(TextScan.spaceTokenStats(UTF8String.fromString(t), wordBytes)
        .sameElements(slow(t)), s"fuzz $i: '$t'")
    }
  }

  test("space-count + 1 equals size(split(text, ' ')) — the nTokWs tokenize (r14)") {
    // split keeps empty tokens (leading/trailing/consecutive spaces),
    // so tokens = (#0x20 codepoints) + 1 for EVERY string incl. ""
    val rng = new scala.util.Random(14)
    val alpha = "ab é世  x ".toCharArray
    val cases = Seq("", " ", "  ", "a", "a b", " a", "a ", "a  b ",
      "世 界", "tab\tnot-space") ++
      (0 until 300).map(_ => (0 until rng.nextInt(30))
        .map(_ => alpha(rng.nextInt(alpha.length))).mkString)
    cases.foreach { t =>
      val scan = graft.functions.TextScan.countCodepointRange(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), 0x20, 0x20) + 1
      assert(scan == t.split(" ", -1).length, s"input '$t'")
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
