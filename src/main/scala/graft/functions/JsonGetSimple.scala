package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, GetJsonObject, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass byte scanner behind [[JsonGetSimple]].
  *
  * `extract(json, key)` resolves `$.key` over a top-level JSON object
  * and returns the scalar value text — or [[JsonFast.BAIL]] (reference
  * identity) whenever EXACT parity with Spark's own `get_json_object`
  * is not locally provable, in which case the caller re-evaluates with
  * the built-in Jackson path. Fast-pathed: plain-integer values,
  * escape-free strings, `true`/`false`. Bailed: nested object/array
  * results, JSON `null`, floats/exponents/leading zeros (Jackson may
  * normalize), escaped keys or values, duplicate keys, any top-level
  * non-object, any malformed input.
  *
  * Parity demands STRICT validation of everything the scan steps
  * over, not just the matched value: Jackson parses the document as
  * one token stream, so a leading-zero number, bad escape, or raw
  * control character in some OTHER key's value makes the built-in
  * return NULL for the whole row. Skipped values therefore go through
  * the same strict JSON grammar (RFC 8259), and any violation bails
  * to the exact path. CAUTION: Spark's shared Jackson factory is NOT
  * all-default-strict — it enables ALLOW_UNESCAPED_CONTROL_CHARS and
  * ALLOW_SINGLE_QUOTES, so the built-in ACCEPTS documents this strict
  * grammar rejects. That is safe only because rejection here means
  * BAIL (re-evaluate exactly), never "return NULL"; do not tighten a
  * BAIL into a NULL without first matching those two laxness flags.
  * The only assumption kept from the column
  * contract is valid UTF-8 (guaranteed by Spark `UTF8String` sources).
  *
  * The scan is ~100 ns for typical telemetry-sized objects vs ~4 µs
  * for a streaming Jackson parse — on a 100 TB events table that is
  * the difference between a json-extract column being free and being
  * the bottleneck.
  */
object JsonFast {
  /** sentinel: "use the exact built-in evaluator" (compare with `eq`) */
  val BAIL: UTF8String = UTF8String.fromString(" graft-json-bail")

  private val TRUE = UTF8String.fromString("true")
  private val FALSE = UTF8String.fromString("false")

  def extract(json: UTF8String, key: UTF8String): UTF8String = {
    val b = json.getBytes
    val kb = key.getBytes
    val n = b.length
    var i = 0
    var sawEsc = false

    @inline def ws(): Unit = {
      while (i < n && (b(i) == ' ' || b(i) == '\t' || b(i) == '\n' || b(i) == '\r')) i += 1
    }

    /** i is just past an opening quote; scan to the closing quote with
      * strict escape validation. Returns the closing-quote index (i
      * ends just past it) or -1 on anything Jackson would reject: bad
      * escape letter, short/non-hex \u, raw control byte. Sets
      * `sawEsc` for callers that must bail on escape processing. */
    def scanString(): Int = {
      sawEsc = false
      while (i < n) {
        val c = b(i)
        if (c == '"') { val e = i; i += 1; return e }
        else if (c == '\\') {
          sawEsc = true
          i += 1
          if (i >= n) return -1
          val e = b(i)
          if (e == '"' || e == '\\' || e == '/' || e == 'b' || e == 'f' ||
              e == 'n' || e == 'r' || e == 't') i += 1
          else if (e == 'u') {
            i += 1
            var j = 0
            while (j < 4) {
              if (i >= n) return -1
              val h = b(i)
              if (!((h >= '0' && h <= '9') || (h >= 'a' && h <= 'f') ||
                    (h >= 'A' && h <= 'F'))) return -1
              i += 1; j += 1
            }
          } else return -1
        }
        else if ((c & 0xFF) < 0x20) return -1 // raw control char: Jackson rejects
        else i += 1
      }
      -1
    }

    /** strict RFC 8259 number at i: -?(0|[1-9]\d*)(\.\d+)?([eE][+-]?\d+)? */
    def scanNumber(): Boolean = {
      if (b(i) == '-') i += 1
      if (i >= n) return false
      if (b(i) == '0') i += 1
      else if (b(i) >= '1' && b(i) <= '9') {
        while (i < n && b(i) >= '0' && b(i) <= '9') i += 1
      } else return false
      if (i < n && b(i) == '.') {
        i += 1
        if (i >= n || b(i) < '0' || b(i) > '9') return false
        while (i < n && b(i) >= '0' && b(i) <= '9') i += 1
      }
      if (i < n && (b(i) == 'e' || b(i) == 'E')) {
        i += 1
        if (i < n && (b(i) == '+' || b(i) == '-')) i += 1
        if (i >= n || b(i) < '0' || b(i) > '9') return false
        while (i < n && b(i) >= '0' && b(i) <= '9') i += 1
      }
      true
    }

    def scanLiteral(lit: String): Boolean = {
      var j = 0
      while (j < lit.length) {
        if (i >= n || b(i) != lit.charAt(j)) return false
        i += 1; j += 1
      }
      true
    }

    /** strictly validate-and-skip one non-matching value at i;
      * false → BAIL (Jackson would reject the document, or it is too
      * deep to prove cheaply) */
    def skipValue(depth: Int): Boolean = {
      if (depth > 64 || i >= n) return false
      val c = b(i)
      if (c == '"') { i += 1; scanString() >= 0 }
      else if (c == '{') {
        i += 1; ws()
        if (i < n && b(i) == '}') { i += 1; return true }
        while (true) {
          ws()
          if (i >= n || b(i) != '"') return false
          i += 1
          if (scanString() < 0) return false
          ws()
          if (i >= n || b(i) != ':') return false
          i += 1; ws()
          if (!skipValue(depth + 1)) return false
          ws()
          if (i >= n) return false
          if (b(i) == '}') { i += 1; return true }
          if (b(i) != ',') return false
          i += 1
        }
        false // unreachable
      }
      else if (c == '[') {
        i += 1; ws()
        if (i < n && b(i) == ']') { i += 1; return true }
        while (true) {
          ws()
          if (!skipValue(depth + 1)) return false
          ws()
          if (i >= n) return false
          if (b(i) == ']') { i += 1; return true }
          if (b(i) != ',') return false
          i += 1
        }
        false // unreachable
      }
      else if (c == 't') scanLiteral("true")
      else if (c == 'f') scanLiteral("false")
      else if (c == 'n') scanLiteral("null")
      else if (c == '-' || (c >= '0' && c <= '9')) scanNumber()
      else false
    }

    ws()
    if (i >= n || b(i) != '{') return BAIL // non-object root → exact path
    i += 1
    var result: UTF8String = null
    var found = false
    var first = true
    while (true) {
      ws()
      if (i >= n) return BAIL
      if (b(i) == '}') {
        i += 1; ws()
        if (i < n) return BAIL // trailing bytes after root → exact path
        return if (found) result else null // absent key → NULL
      }
      if (!first) {
        if (b(i) != ',') return BAIL
        i += 1; ws()
        if (i >= n) return BAIL
      }
      first = false
      if (b(i) != '"') return BAIL
      i += 1
      val ks = i
      val ke = scanString()
      if (ke < 0) return BAIL
      if (sawEsc) return BAIL // escaped key text → exact compare is Jackson's job
      var isMatch = (ke - ks) == kb.length
      if (isMatch) {
        var j = 0
        while (isMatch && j < kb.length) { if (b(ks + j) != kb(j)) isMatch = false; j += 1 }
      }
      if (isMatch && found) return BAIL // duplicate key: built-in semantics are subtle
      ws()
      if (i >= n || b(i) != ':') return BAIL
      i += 1; ws()
      if (i >= n) return BAIL
      if (!isMatch) {
        if (!skipValue(0)) return BAIL
      } else {
        val c = b(i)
        if (c == '"') {
          i += 1
          val vs = i
          val ve = scanString()
          if (ve < 0) return BAIL
          if (sawEsc) return BAIL // escape processing → exact path
          found = true
          result = UTF8String.fromBytes(b, vs, ve - vs)
        } else if (c == 't' || c == 'f') {
          if (!scanLiteral(if (c == 't') "true" else "false")) return BAIL
          found = true
          result = if (c == 't') TRUE else FALSE
        } else if (c == '-' || (c >= '0' && c <= '9')) {
          val vs = i
          if (!scanNumber()) return BAIL
          // Jackson round-trips matched integers through writeNumber,
          // so any form it would respell must bail: floats/exponents
          // (its own spelling) and "-0…" (written back as "0").
          var j = vs
          if (b(vs) == '-') { if (b(vs + 1) == '0') return BAIL; j = vs + 1 }
          else if (b(vs) == '0' && i - vs > 1) return BAIL // 0.5/0e1 float forms
          var isFloat = false
          while (j < i && !isFloat) {
            val d = b(j)
            if (d == '.' || d == 'e' || d == 'E') isFloat = true
            j += 1
          }
          if (isFloat) return BAIL
          found = true
          result = UTF8String.fromBytes(b, vs, i - vs)
        } else return BAIL // null / object / array result → exact path
      }
    }
    BAIL // unreachable
  }
}

/** Exact re-evaluation path: Spark's own GetJsonObject over the same
  * input. The evaluator reuses internal buffers, so calls are
  * synchronized — acceptable because only BAIL rows (rare, hard
  * cases) ever reach it. */
final class JsonFallback(field: String) extends (UTF8String => UTF8String) with Serializable {
  @transient private lazy val expr =
    GetJsonObject(BoundReference(0, StringType, nullable = true),
      Literal.create("$." + field, StringType))
  @transient private lazy val row = new GenericInternalRow(1)
  override def apply(js: UTF8String): UTF8String = synchronized {
    row.update(0, js)
    expr.eval(row).asInstanceOf[UTF8String]
  }
}

/** `get_json_object(json, '$.field')` with a fast single-pass scan and
  * an exact built-in fallback — installed by graft.plans.FastJsonRule
  * (SURVEY.md §2.10 custom-Expression tier: codegen, no per-row
  * Jackson parser for the common telemetry shape). */
case class JsonGetSimple(child: Expression, field: String) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_get_simple"

  private lazy val keyUtf8 = UTF8String.fromString(field)
  private lazy val fallback = new JsonFallback(field)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"json_get_simple requires a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val js = input.asInstanceOf[UTF8String]
    val r = JsonFast.extract(js, keyUtf8)
    if (r eq JsonFast.BAIL) fallback(js) else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val u = "org.apache.spark.unsafe.types.UTF8String"
    val keyRef = ctx.addReferenceObj("jsonKey", keyUtf8, u)
    val fbRef = ctx.addReferenceObj("jsonFallback", fallback, "scala.Function1")
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("jr")
      s"""
         |$u $r = graft.functions.JsonFast.extract($c, $keyRef);
         |if ($r == graft.functions.JsonFast.BAIL()) {
         |  $r = ($u) ((scala.Function1) $fbRef).apply($c);
         |}
         |${ev.isNull} = ($r == null);
         |${ev.value} = $r;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
