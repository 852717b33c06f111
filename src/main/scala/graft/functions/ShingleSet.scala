package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct-shingle extractor: `graft_shingle_set(text)` →
  * array<string> of the document's distinct 3-word shingles in
  * first-occurrence order, NULL for documents with fewer than 3 words
  * (callers explode, which maps NULL to the same "no rows" frame the
  * declarative `TextOps.shingles` empty array produces).
  *
  * This is [[MinHashSig]]'s shingle arm ([[MinHashSig.shingleSet]])
  * WITHOUT the md5 + 16 affine hashes per shingle — for content-
  * overlap audits (cross-source shingle novelty, containment counts)
  * that need the exact shingle SETS but no signature, the md5 work is
  * pure waste. Same scale argument as the parent: a per-row O(tokens)
  * loop with ZERO shuffle, versus the interpreted `transform` Column
  * form (~10 s at sf0.1, [[graft.ext.TextOps.shingles]] scaladoc) or
  * a window-based shingleRows pass that shuffles token volume.
  */
case class ShingleSet(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_shingle_set expects string, got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // null for < 3 words, independent of child nullability
  override def nullable: Boolean = true

  override def prettyName: String = "graft_shingle_set"

  override def nullSafeEval(s: Any): Any =
    ShingleSet.compute(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ShingleSet.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

object ShingleSet {

  def compute(s: UTF8String): GenericArrayData = {
    val seen = MinHashSig.shingleSet(s)
    if (seen == null) return null
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())))
  }
}
