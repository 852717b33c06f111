package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Shannon character entropy over a string:
  * `graft_char_entropy(str)` = -Σ p(c)·log2 p(c) over the string's
  * Unicode code points — the classic gibberish/boilerplate signal of a
  * training-data quality filter (near-0 for repeated filler, ~4.2 for
  * natural English, ~log2(alphabet) for uniform noise).
  *
  * The declarative alternative explodes one row PER CHARACTER and
  * aggregates them back (two shuffles whose row count is the total
  * character count of the corpus — at 100 TB that is ~10^14 shuffle
  * rows); this is a per-row O(len) loop inside whole-stage codegen
  * with zero shuffle, like [[ByteHistogram]]. Null in → null out; the
  * empty string has entropy 0.0 by convention.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_char_entropy expects string, got ${t.simpleString}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_char_entropy"

  override def nullSafeEval(s: Any): Any =
    CharEntropy.compute(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CharEntropy.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {

  private val Log2 = math.log(2.0)

  /** One pass to count code-point frequencies (ASCII fast path in a
    * flat array, a map for the astral remainder), one pass over the
    * (small) alphabet to sum. Summation order is fixed — ascending
    * code point — so results are reproducible across partitionings. */
  def compute(s: UTF8String): Double = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n == 0) return 0.0
    val ascii = new Array[Long](128)
    var other: java.util.TreeMap[Integer, Long] = null
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.TreeMap[Integer, Long]()
        val prev = other.get(cp)
        other.put(cp, if (prev == null) 1L else prev + 1L)
      }
      i += Character.charCount(cp)
    }
    var h = 0.0
    var c = 0
    while (c < 128) {
      val cnt = ascii(c)
      if (cnt > 0) {
        val p = cnt.toDouble / n
        h -= p * math.log(p) / Log2
      }
      c += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) {
        val p = it.next().toDouble / n
        h -= p * math.log(p) / Log2
      }
    }
    h
  }
}
