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

/** Native positional shingle extractor: `graft_shingle_rows(text)` →
  * array<string> of ALL K-word shingles in position order (element i =
  * the shingle starting at token i, duplicates kept), NULL for
  * documents with fewer than K words. The occurrence-form sibling of
  * [[ShingleSet]]: `posexplode` over it reproduces
  * `TextOps.shingleRowsPos`'s (pos, shingle) rows WITHOUT the token
  * posexplode → per-doc lead()-window pass — i.e. without shuffling
  * corpus-token volume through an exchange + sort just to assemble
  * grams (r21 optimization; parity-pinned in TextOpsSpec). Same
  * tokenizer as the whole native family: [[SimHash60.tokenRanges]] is
  * the byte-level twin of split("\\s+", -1) INCLUDING the boundary
  * empty tokens it emits for leading/trailing whitespace, so the
  * equivalence with the windowed words() form holds for ANY text
  * (boundary-whitespace cases pinned in TextOpsSpec, r22). */
case class ShingleRows(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_shingle_rows expects string, got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // null for < K words, independent of child nullability
  override def nullable: Boolean = true

  override def prettyName: String = "graft_shingle_rows"

  override def nullSafeEval(s: Any): Any =
    ShingleRows.compute(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ShingleRows.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): ShingleRows =
    copy(child = newChild)
}

object ShingleRows {

  def compute(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val (starts, ends, ntok) = SimHash60.tokenRanges(bytes)
    val k = MinHashSig.K
    if (ntok < k) return null
    val out = new Array[AnyRef](ntok - k + 1)
    var t = 0
    while (t <= ntok - k) {
      var len = k - 1
      var j = 0
      while (j < k) { len += ends(t + j) - starts(t + j); j += 1 }
      val g = new Array[Byte](len)
      var p = 0
      j = 0
      while (j < k) {
        if (j > 0) { g(p) = ' '; p += 1 }
        val l = ends(t + j) - starts(t + j)
        System.arraycopy(bytes, starts(t + j), g, p, l)
        p += l
        j += 1
      }
      out(t) = UTF8String.fromBytes(g)
      t += 1
    }
    new GenericArrayData(out)
  }
}
