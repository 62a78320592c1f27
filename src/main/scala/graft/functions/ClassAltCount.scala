package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte/codepoint-scan counter for regexp_count patterns of the form
  * `C1(+)|C2(+)|…` where each Ci is a simple ASCII character class —
  * the tokenizer-count family (`[a-z]+|[0-9]+|[^a-z0-9\s]`).
  *
  * Equivalence to java.util.regex find(): with nothing after a `+`,
  * the greedy maximal run IS the match (no backtracking continuation
  * exists); find() takes the leftmost start, trying alternation
  * branches in pattern order, and resumes after the consumed length,
  * advancing one CODEPOINT on failure (java regex character classes
  * are codepoint-aware, including negated classes matching
  * supplementary characters as single units). The kernel iterates
  * decoded codepoints and replicates exactly that. ASCII membership is
  * a 128-bit bitmap; a non-ASCII codepoint matches a class iff the
  * class is negated (a class literal can only name ASCII members in
  * the accepted subset). Cross-checked against java.util.regex in
  * TextScanSpec.
  */
object ClassAltCount {

  /** one branch: 2×64-bit ASCII bitmap, negated?, plus-quantified? */
  final case class Branch(mask0: Long, mask1: Long, negated: Boolean, plus: Boolean) {
    def matches(cp: Int): Boolean = {
      val in =
        if (cp < 64) ((mask0 >>> cp) & 1L) == 1L
        else if (cp < 128) ((mask1 >>> (cp - 64)) & 1L) == 1L
        else false
      if (negated) !in && cp >= 0 else in
    }
  }

  /** Parse the accepted pattern subset: alternation of `[...]` or
    * `[...]+`, class members = printable ASCII literals, ASCII ranges,
    * and the escapes \s \t \n \r \d \\ \] \[ \- ; leading ^ negates.
    * Returns None for anything else (the caller keeps the builtin). */
  def parse(pattern: String): Option[Array[Branch]] = {
    val branches = scala.collection.mutable.ArrayBuffer[Branch]()
    var i = 0
    val n = pattern.length
    while (i < n) {
      if (pattern.charAt(i) != '[') return None
      i += 1
      var negated = false
      if (i < n && pattern.charAt(i) == '^') { negated = true; i += 1 }
      var m0 = 0L; var m1 = 0L
      def add(c: Int): Unit = {
        if (c < 64) m0 |= (1L << c) else if (c < 128) m1 |= (1L << (c - 64))
      }
      def addRange(a: Int, b: Int): Unit = { var c = a; while (c <= b) { add(c); c += 1 } }
      var closed = false
      var empty = true
      while (i < n && !closed) {
        pattern.charAt(i) match {
          case ']' if !empty => closed = true; i += 1
          case '&' =>
            // java class syntax: `&&` is set INTERSECTION — treating
            // the ampersands as literals would silently change counts;
            // a single literal '&' is too close to misread, reject both
            return None
          case '\\' if i + 1 < n =>
            pattern.charAt(i + 1) match {
              case 's' => add(' '); add('\t'); add('\n'); add(0x0B); add('\f'); add('\r')
              case 'd' => addRange('0', '9')
              case 't' => add('\t')
              case 'n' => add('\n')
              case 'r' => add('\r')
              case c @ ('\\' | ']' | '[' | '-' | '^') => add(c)
              case _ => return None
            }
            empty = false; i += 2
            // an escape as a range LOWER endpoint ([\t-z] = java range
            // 0x09..'z') would misparse as three literals — reject
            if (i + 1 < n && pattern.charAt(i) == '-' && pattern.charAt(i + 1) != ']')
              return None
          case c if c >= 0x20 && c < 0x7f =>
            // range? literal 'a-z' (the '-' must sit between two plain members)
            if (i + 2 < n && pattern.charAt(i + 1) == '-' && pattern.charAt(i + 2) != ']') {
              val hi = pattern.charAt(i + 2)
              // hi must also be plain printable ASCII: a non-ASCII
              // upper endpoint ([a-é]) would silently drop the >=0x80
              // members from the 128-bit bitmap
              if (hi == '\\' || hi < 0x20 || hi >= 0x7f || c > hi) return None
              addRange(c, hi); empty = false; i += 3
            } else { add(c); empty = false; i += 1 }
          case _ => return None
        }
      }
      if (!closed) return None
      var plus = false
      if (i < n && pattern.charAt(i) == '+') { plus = true; i += 1 }
      branches += Branch(m0, m1, negated, plus)
      if (i < n) {
        if (pattern.charAt(i) != '|' || i + 1 >= n) return None
        i += 1
      }
    }
    if (branches.isEmpty) None else Some(branches.toArray)
  }

  /** codegen entry: generated Java can't name the nested Scala type,
    * so the reference rides as Object (the JsonGetSimple pattern) */
  def countRef(s: UTF8String, branches: AnyRef): Int =
    count(s, branches.asInstanceOf[Array[Branch]])

  /** count of non-overlapping matches, java find() semantics;
    * codepoint decode shared via [[TextScan.codePointAt]] */
  def count(s: UTF8String, branches: Array[Branch]): Int = {
    val n = s.numBytes()
    var i = 0
    var cnt = 0
    def cpAt(i: Int): Long = TextScan.codePointAt(s, i, n)
    while (i < n) {
      val e = cpAt(i)
      val cp = (e >>> 3).toInt
      val len = (e & 7L).toInt
      var took = 0
      var b = 0
      while (took == 0 && b < branches.length) {
        val br = branches(b)
        if (br.matches(cp)) {
          took = len
          if (br.plus) {
            var j = i + len
            var go = true
            while (go && j < n) {
              val e2 = cpAt(j)
              if (br.matches((e2 >>> 3).toInt)) { val l2 = (e2 & 7L).toInt; took += l2; j += l2 }
              else go = false
            }
          }
          cnt += 1
        }
        b += 1
      }
      i += (if (took > 0) took else len)
    }
    cnt
  }
}

/** codegen'd counter over a parsed class-alternation (see companion) */
case class ClassAltCount(child: Expression, pattern: String) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "class_alt_count"

  // parsed once per instance (and once per executor after
  // deserialization); the type check reads the same result, so the
  // eval path's branches can never diverge from what it validated
  @transient private lazy val parsed: Option[Array[ClassAltCount.Branch]] =
    ClassAltCount.parse(pattern)
  @transient private lazy val branches: Array[ClassAltCount.Branch] = parsed.get

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"class_alt_count requires a string input, got ${child.dataType}")
    else if (parsed.isEmpty)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"class_alt_count: unsupported pattern $pattern")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    ClassAltCount.count(input.asInstanceOf[UTF8String], branches)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("branches", branches, "java.lang.Object")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ClassAltCount.countRef($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
