package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native codegen'd 16-bin high-nibble byte histogram over a `binary`
  * column: `graft_byte_hist(media, offset)` counts, for each nibble
  * value 0-15, the payload bytes (from `offset` on) whose high 4 bits
  * equal it — the baseline content feature for codec-free media
  * payloads (the classic intensity-histogram image feature, computed
  * from the ACTUAL decoded bytes, not a hash of them).
  *
  * Spark has no per-byte iteration built-in (a `hex` + string-split
  * detour interprets and allocates per byte); this is a primitive
  * `byte[]` loop inside whole-stage codegen, like [[DotProduct]].
  * Null binary propagates null; an offset at-or-past the payload end
  * yields all-zero bins (not null — the media exists, it is just
  * headerless/empty).
  */
case class ByteHistogram(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_byte_hist expects (binary, int), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_byte_hist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val bytes = a.asInstanceOf[Array[Byte]]
    val off = math.max(b.asInstanceOf[Int], 0)
    val h = new Array[Long](16)
    var i = off
    while (i < bytes.length) {
      h((bytes(i) >> 4) & 0xF) += 1
      i += 1
    }
    new GenericArrayData(h)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val h = ctx.freshName("hist")
      s"""
         |long[] $h = new long[16];
         |for (int $i = java.lang.Math.max($b, 0); $i < $a.length; $i++) {
         |  $h[($a[$i] >> 4) & 0xF]++;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($h);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ByteHistogram =
    copy(left = newLeft, right = newRight)
}
