package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-key JSON integer extraction:
  * `graft_json_long(json, 'key')` = the top-level field `key` of a
  * JSON object, parsed as a long — the codegen'd fast path for
  * `get_json_object(json, '$.key')::long`, the hottest expression of
  * the events facade (every NILM adapter query shreds one integer out
  * of the `props` column; `get_json_object` runs an interpreted
  * Jackson parse per row).
  *
  * A real scanner, not a regex: tracks brace/bracket depth, skips
  * string values with escape handling, matches the key ONLY at the
  * object's top level (first occurrence wins, like Jackson streaming),
  * and accepts the value as a bare integer or a quoted integer
  * (`7` / `"7"`). Returns null for missing keys, non-integer values,
  * nested-object/array values, or malformed JSON — the data contract
  * (`props.k` is integral) is oracle-checked, so the ANSI cast-error
  * path of the `get_json_object` form has no counterpart to diverge
  * from. Parity with `get_json_object(...).cast("long")` is
  * property-tested on randomized nested/escaped JSON.
  */
case class JsonLongKey(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_json_long expects (json string, literal key string)")
    }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_json_long"

  /** The key is a foldable literal (enforced by checkInputDataTypes):
    * convert it to a JVM String ONCE, not per row — both eval paths
    * use this instead of re-running UTF8String.toString() per row.
    * Null-literal keys never reach either path (nullSafeEval /
    * nullSafeCodeGen short-circuit on a null child), so the "" stand-in
    * is dead code that only keeps the reference non-null. */
  @transient private lazy val keyString: String =
    Option(right.eval()).map(_.toString).getOrElse("")

  override def nullSafeEval(json: Any, k: Any): Any =
    JsonLongKey.compute(json.asInstanceOf[UTF8String].toString, keyString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (json, _) => {
      // fresh name: two instances of this expression in one generated
      // function must not redeclare the same local (a collision fails
      // janino compilation and silently drops the stage to interpreted)
      val r = ctx.freshName("jsonLong")
      // hoist the key's UTF8String→String conversion out of the
      // per-row loop: the literal is pre-converted on the driver and
      // shipped as a generated-class reference object
      val keyRef = ctx.addReferenceObj("graftJsonKey", keyString, "java.lang.String")
      s"""
      Long $r = graft.functions.JsonLongKey.compute($json.toString(), $keyRef);
      ${ev.isNull} = $r == null;
      ${ev.value} = ${ev.isNull} ? -1L : $r.longValue();
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsonLongKey =
    copy(left = newLeft, right = newRight)
}

object JsonLongKey {

  /** Returns boxed Long or null. */
  def compute(json: String, key: String): java.lang.Long = {
    val n = json.length
    var i = skipWs(json, 0)
    if (i >= n || json.charAt(i) != '{') return null
    i += 1
    var first = true
    while (i < n) {
      i = skipWs(json, i)
      if (i < n && json.charAt(i) == '}') return null // end of object
      if (!first) {
        if (i >= n || json.charAt(i) != ',') return null
        i = skipWs(json, i + 1)
      }
      first = false
      // field name
      if (i >= n || json.charAt(i) != '"') return null
      val keyStart = i + 1
      i = skipString(json, i)
      if (i < 0) return null
      val matches = keyEquals(json, keyStart, i - 1, key)
      i = skipWs(json, i)
      if (i >= n || json.charAt(i) != ':') return null
      i = skipWs(json, i + 1)
      if (matches) return parseLongValue(json, i)
      i = skipValue(json, i)
      if (i < 0) return null
    }
    null
  }

  private def skipWs(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
      s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1
    i
  }

  /** `i` at the opening quote; returns index after the closing quote,
    * or -1. Escapes only need `\X` skipping — the raw chars between
    * the quotes are compared unescaped, matching keys that contain no
    * escape sequences (the engine's key argument is a plain literal). */
  private def skipString(s: String, from: Int): Int = {
    var i = from + 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\') i += 2
      else if (c == '"') return i + 1
      else i += 1
    }
    -1
  }

  private def keyEquals(s: String, start: Int, endQuote: Int, key: String): Boolean = {
    if (endQuote - start != key.length) return false
    var i = 0
    while (i < key.length) {
      if (s.charAt(start + i) != key.charAt(i)) return false
      i += 1
    }
    true
  }

  /** `i` at a value's first char; returns index after the value, -1 on
    * malformed input. */
  private def skipValue(s: String, from: Int): Int = {
    val n = s.length
    if (from >= n) return -1
    s.charAt(from) match {
      case '"' => skipString(s, from)
      case '{' | '[' =>
        var depth = 0
        var i = from
        while (i < n) {
          s.charAt(i) match {
            case '{' | '[' => depth += 1; i += 1
            case '}' | ']' =>
              depth -= 1; i += 1
              if (depth == 0) return i
            case '"' =>
              i = skipString(s, i)
              if (i < 0) return -1
            case _ => i += 1
          }
        }
        -1
      case _ => // number / true / false / null: scan to delimiter
        var i = from
        while (i < n && s.charAt(i) != ',' && s.charAt(i) != '}' &&
          s.charAt(i) != ']' && !Character.isWhitespace(s.charAt(i))) i += 1
        i
    }
  }

  /** Bare or quoted integer → Long; anything else → null. Accumulates
    * in NEGATIVE space (|Long.MinValue| > Long.MaxValue, so
    * -9223372036854775808 parses without an intermediate overflow) and
    * returns null on magnitudes beyond Long range — matching the
    * non-ANSI `get_json_object(...).cast("long")` this expression
    * replaces, which yields null rather than a wrapped value. */
  private def parseLongValue(s: String, from: Int): java.lang.Long = {
    var i = from
    val n = s.length
    if (i >= n) return null
    var quoted = false
    if (s.charAt(i) == '"') { quoted = true; i += 1 }
    var neg = false
    if (i < n && s.charAt(i) == '-') { neg = true; i += 1 }
    if (i >= n || !Character.isDigit(s.charAt(i))) return null
    var v = 0L // accumulated as -(magnitude)
    while (i < n && Character.isDigit(s.charAt(i))) {
      val d = s.charAt(i) - '0'
      // overflow guard BEFORE each step: v*10 - d must stay >= Long.MinValue
      if (v < Long.MinValue / 10 ||
        (v == Long.MinValue / 10 && d > -(Long.MinValue % 10))) return null
      v = v * 10 - d
      i += 1
    }
    if (quoted) {
      if (i >= n || s.charAt(i) != '"') return null
      i += 1
    }
    // a trailing fraction/exponent/garbage means the value is not an
    // integer — null rather than a truncated number
    if (i < n && s.charAt(i) != ',' && s.charAt(i) != '}' &&
      !Character.isWhitespace(s.charAt(i))) return null
    if (neg) java.lang.Long.valueOf(v)
    else if (v == Long.MinValue) null // +9223372036854775808 overflows
    else java.lang.Long.valueOf(-v)
  }
}
