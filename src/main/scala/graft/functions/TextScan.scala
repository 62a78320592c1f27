package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass byte-scan kernels replacing the java.util.regex engine
  * for the two literal-pattern `regexp_count` shapes a text-quality
  * pipeline runs per document (stopword-set counts `\b(w1|w2|…)\b`
  * and codepoint-class counts `[\x{a}-\x{b}]`). Installed by
  * [[graft.plans.FastRegexCountRule]] ONLY when the rewrite is
  * provably equivalent to the regex engine's find() semantics; every
  * other pattern keeps the builtin.
  *
  * Equivalence argument (java.util.regex, non-UNICODE_CHARACTER_CLASS
  * mode — Spark's default): even without the UNICODE flag, java's
  * `\b` (Pattern's Bound node) is NOT `\w`-relative — it decodes the
  * adjacent CODEPOINT and tests `cp=='_' || isLetterOrDigit(cp) ||
  * (getType(cp)==NON_SPACING_MARK && hasBaseCharacter)`, so CJK/
  * accented letters are word chars at boundaries. The kernels decode
  * boundary-adjacent codepoints and apply that exact predicate
  * (including Bound's char-at-a-time hasBaseCharacter walk, which
  * sees a preceding supplementary codepoint as its unpaired low
  * surrogate and stops). Match STARTS are still byte-scanned: word
  * literals begin with ASCII word bytes, and no byte of a multi-byte
  * UTF-8 sequence is an ASCII word byte. find() takes the leftmost
  * match, trying alternation branches in pattern order at each start
  * — for word-literal branches that is: at each boundary start, the
  * first branch whose bytes match AND whose trailing boundary holds
  * wins and consumes its length. TextScanSpec cross-checks against
  * java.util.regex on adversarial inputs (punctuation, shared
  * prefixes, CJK/accents/combining-mark/supplementary neighbors,
  * overlaps) on an RDD-backed frame so the kernels actually execute.
  */
object TextScan {

  def isWordByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
    (b >= '0' && b <= '9') || b == '_'

  /** java.util.regex Bound's hasBaseCharacter, on UTF-8 bytes: walk
    * codepoints BACKWARD from byte offset `end` (exclusive — the
    * triggering mark itself is already consumed by Bound's loop);
    * letter/digit → base found, non-spacing marks are skipped,
    * anything else stops. Java walks one CHAR at a time, so a
    * preceding supplementary codepoint is seen as its unpaired low
    * surrogate (type SURROGATE) and stops the walk — replicated here
    * by stopping on any cp > 0xFFFF. */
  private def hasBaseChar(s: UTF8String, end: Int): Boolean = {
    var e = end
    while (e > 0) {
      var st = e - 1
      while (st > 0 && (s.getByte(st) & 0xc0) == 0x80) st -= 1
      val cp = (codePointAt(s, st, e) >>> 3).toInt
      if (cp > 0xFFFF) return false
      if (Character.isLetterOrDigit(cp)) return true
      if (Character.getType(cp) != Character.NON_SPACING_MARK) return false
      e = st
    }
    false
  }

  /** is the codepoint ENDING at byte `i` (exclusive) a Bound word
    * char? (`false` at the string start — \b holds there). Bound's
    * LEFT check hands hasBaseCharacter the neighbor's LAST char
    * index, so a supplementary NSM is seen as its own unpaired low
    * surrogate → "no base" immediately (hence `cp <= 0xFFFF`). */
  def leftIsWord(s: UTF8String, i: Int): Boolean = {
    if (i <= 0) return false
    val pb = s.getByte(i - 1)
    if ((pb & 0x80) == 0) return isWordByte(pb)
    var st = i - 1
    while (st > 0 && (s.getByte(st) & 0xc0) == 0x80) st -= 1
    val cp = (codePointAt(s, st, i) >>> 3).toInt
    cp == '_' || Character.isLetterOrDigit(cp) ||
    (Character.getType(cp) == Character.NON_SPACING_MARK && cp <= 0xFFFF &&
      hasBaseChar(s, st))
  }

  /** is the codepoint STARTING at byte `j` a Bound word char?
    * (`false` at the string end). Bound's RIGHT check hands
    * hasBaseCharacter the neighbor's FIRST char index, so even a
    * supplementary NSM is seen fully and skipped before the walk. */
  def rightIsWord(s: UTF8String, j: Int, n: Int): Boolean = {
    if (j >= n) return false
    val b = s.getByte(j)
    if ((b & 0x80) == 0) return isWordByte(b)
    val cp = (codePointAt(s, j, n) >>> 3).toInt
    cp == '_' || Character.isLetterOrDigit(cp) ||
    (Character.getType(cp) == Character.NON_SPACING_MARK && hasBaseChar(s, j))
  }

  /** count of non-overlapping `\b(w1|w2|…)\b` matches, branch order
    * preserved */
  def countWordSet(s: UTF8String, words: Array[Array[Byte]]): Int = {
    val n = s.numBytes()
    var i = 0
    var cnt = 0
    while (i < n) {
      val b = s.getByte(i)
      if (isWordByte(b) && !leftIsWord(s, i)) {
        var matchedLen = 0
        var w = 0
        while (matchedLen == 0 && w < words.length) {
          val word = words(w)
          val L = word.length
          if (i + L <= n) {
            var j = 0
            while (j < L && s.getByte(i + j) == word(j)) j += 1
            if (j == L && !rightIsWord(s, i + L, n))
              matchedLen = L
          }
          w += 1
        }
        if (matchedLen > 0) { cnt += 1; i += matchedLen }
        else i += 1
      } else i += 1
    }
    cnt
  }

  /** decode the UTF-8 codepoint at byte `i` of `s` (which has `n`
    * bytes): packed `(codepoint << 3) | byteLen` — the ONE decode
    * shared by every codepoint-iterating kernel (a second copy would
    * have to be kept bit-identical forever) */
  def codePointAt(s: UTF8String, i: Int, n: Int): Long = {
    val b = s.getByte(i) & 0xff
    if (b < 0x80) (b.toLong << 3) | 1L
    else {
      var len = 1; var cp = 0
      if ((b & 0xe0) == 0xc0) { len = 2; cp = b & 0x1f }
      else if ((b & 0xf0) == 0xe0) { len = 3; cp = b & 0x0f }
      else { len = 4; cp = b & 0x07 }
      var j = 1
      while (j < len && i + j < n) { cp = (cp << 6) | (s.getByte(i + j) & 0x3f); j += 1 }
      (cp.toLong << 3) | len.toLong
    }
  }

  /** Exact `split(' ')` token statistics in ONE byte pass, no
    * allocation: returns [token count, tf(words(0)), tf(words(1)), …].
    * Semantics are EXACTLY `text.split(" ", -1)` + equality counting —
    * tokens delimited by the 0x20 byte (never a UTF-8 continuation
    * byte, so byte-splitting is codepoint-safe), consecutive/trailing
    * separators produce (counted) empty tokens, term match is full
    * byte equality. Feeds the BM25 tf pass (r13 — the typed-map form
    * decoded + split-allocated every document; 0.67 → ~0.2 s per
    * 100 k-doc leg at sf1). */
  def spaceTokenStats(s: UTF8String, words: Array[Array[Byte]]): Array[Long] = {
    val out = new Array[Long](1 + words.length)
    val n = s.numBytes()
    var tokStart = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.getByte(i) == 0x20) {
        out(0) += 1 // the token [tokStart, i)
        val len = i - tokStart
        var w = 0
        while (w < words.length) {
          val word = words(w)
          if (word.length == len) {
            var j = 0
            while (j < len && s.getByte(tokStart + j) == word(j)) j += 1
            if (j == len) out(1 + w) += 1
          }
          w += 1
        }
        tokStart = i + 1
      }
      i += 1
    }
    out
  }

  /** count of codepoints in [lo, hi] (≙ `[\x{lo}-\x{hi}]` matches —
    * each match is one codepoint) */
  def countCodepointRange(s: UTF8String, lo: Int, hi: Int): Int = {
    val n = s.numBytes()
    var i = 0
    var cnt = 0
    while (i < n) {
      val e = codePointAt(s, i, n)
      val cp = (e >>> 3).toInt
      if (cp >= lo && cp <= hi) cnt += 1
      i += (e & 7L).toInt
    }
    cnt
  }
}

/** codegen'd `\b(w1|w2|…)\b` counter (see [[TextScan]]) */
case class WordSetCount(child: Expression, words: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "word_set_count"

  @transient private lazy val wordBytes: Array[Array[Byte]] =
    words.map(_.getBytes("UTF-8")).toArray

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"word_set_count requires a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    TextScan.countWordSet(input.asInstanceOf[UTF8String], wordBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("words", wordBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextScan.countWordSet($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** codegen'd `[\x{lo}-\x{hi}]` codepoint-class counter (see [[TextScan]]) */
case class CodepointRangeCount(child: Expression, lo: Int, hi: Int) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "codepoint_range_count"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"codepoint_range_count requires a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    TextScan.countCodepointRange(input.asInstanceOf[UTF8String], lo, hi)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextScan.countCodepointRange($c, $lo, $hi);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** codegen'd one-pass `split(' ')` token statistics (see
  * [[TextScan.spaceTokenStats]]): array<long> of
  * [token count, tf(words(0)), tf(words(1)), …]. */
case class SpaceTokenStats(child: Expression, words: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "space_token_stats"

  @transient private lazy val wordBytes: Array[Array[Byte]] =
    words.map(_.getBytes("UTF-8")).toArray

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"space_token_stats requires a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      TextScan.spaceTokenStats(input.asInstanceOf[UTF8String], wordBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("words", wordBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(" +
        s"graft.functions.TextScan.spaceTokenStats($c, $ref));")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
