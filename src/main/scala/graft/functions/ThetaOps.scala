package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Theta sketches — distinct counting WITH set algebra.
  *
  * HLL ([[graft.ext.Sketches]]) answers "how many distinct" and unions
  * upward, but cannot intersect: "how many distinct urls/tokens/docs
  * appear in BOTH slices" — the corpus-overlap / contamination-RATE
  * question — needs Theta's k-minimum-hash sample, which supports
  * union, intersection, and difference on the persisted sketch BYTES.
  * At 100 TB: per-slice (source, month, shard) sketches are KB rows
  * computed once at ingest; any pairwise overlap matrix — train∩test,
  * crawl∩crawl, source∩source — is then scalar math on blobs, never a
  * join of the raw corpora. The explicit-key complement of
  * [[BloomAgg]]'s membership routing and the set-algebra sibling of the
  * HLL/KLL modules.
  *
  * Honest contract (ThetaSketchSpec pins it): exact below 2^lgK
  * retained entries; in estimation mode the RSE is ~1/√(2^lgK) on
  * unions, but intersection error is relative to the UNION size, so a
  * small overlap of two large sets carries a proportionally wider band
  * — the spec's bounds scale accordingly. Unlike KLL, Theta is
  * deterministic for a fixed input set and shard topology (k smallest
  * hashes under a fixed seed — no random coins), so recomputation
  * equality is asserted exactly. Null items are skipped.
  */
case class ThetaAgg(itemExpr: Expression, lgKExpr: Expression,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  private lazy val lgK: Int = lgKExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    (itemExpr.dataType, lgKExpr.dataType) match {
      case (StringType, IntegerType) =>
        val ok = lgKExpr.foldable && lgKExpr.eval() != null && {
          val v = lgKExpr.eval().asInstanceOf[Number].intValue()
          v >= 4 && v <= 26 // theta's legal lgNominalEntries range
        }
        if (ok) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "graft_theta lgK must be a literal int in [4, 26]")
      case (i, k) => TypeCheckResult.TypeCheckFailure(
        s"graft_theta expects (string, int), got " +
          s"(${i.simpleString}, ${k.simpleString})")
    }

  override def children: Seq[Expression] = Seq(itemExpr, lgKExpr)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(u: Union, input: InternalRow): Union = {
    val v = itemExpr.eval(input)
    if (v != null) u.update(v.asInstanceOf[UTF8String].toString)
    u
  }

  override def merge(u: Union, other: Union): Union = {
    u.union(other.getResult)
    u
  }

  // compact-ordered result: the persisted form set ops wrap directly
  override def eval(u: Union): Any = u.getResult.toByteArray
  override def serialize(u: Union): Array[Byte] = u.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Sketch.heapify(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaAgg =
    copy(itemExpr = newChildren(0), lgKExpr = newChildren(1))
  override def prettyName: String = "graft_theta"
}

/** Bytes-only rollup: unions persisted [[ThetaAgg]] blobs to any
  * coarser grouping. */
case class ThetaUnionAgg(sketchExpr: Expression, lgKExpr: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  private lazy val lgK: Int = lgKExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    (sketchExpr.dataType, lgKExpr.dataType) match {
      case (BinaryType, IntegerType) =>
        val ok = lgKExpr.foldable && lgKExpr.eval() != null && {
          val v = lgKExpr.eval().asInstanceOf[Number].intValue()
          v >= 4 && v <= 26
        }
        if (ok) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "graft_theta_union lgK must be a literal int in [4, 26]")
      case (s, k) => TypeCheckResult.TypeCheckFailure(
        s"graft_theta_union expects (binary, int), got " +
          s"(${s.simpleString}, ${k.simpleString})")
    }

  override def children: Seq[Expression] = Seq(sketchExpr, lgKExpr)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(u: Union, input: InternalRow): Union = {
    val blob = sketchExpr.eval(input)
    if (blob != null)
      u.union(Sketch.heapify(Memory.wrap(blob.asInstanceOf[Array[Byte]])))
    u
  }

  override def merge(u: Union, other: Union): Union = {
    u.union(other.getResult)
    u
  }

  override def eval(u: Union): Any = u.getResult.toByteArray
  override def serialize(u: Union): Array[Byte] = u.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Sketch.heapify(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaUnionAgg =
    copy(sketchExpr = newChildren(0), lgKExpr = newChildren(1))
  override def prettyName: String = "graft_theta_union"
}

/** `graft_theta_estimate(blob)` — distinct estimate of one blob. */
case class ThetaEstimate(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_theta_estimate expects binary, got ${t.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_theta_estimate"
  override def nullSafeEval(b: Any): Any =
    ThetaEval.estimate(b.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.ThetaEval.estimate($b)")
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** Pairwise set-operation estimates on two blobs — run on AGGREGATED
  * rows (one per slice pair), never raw data. */
abstract class ThetaBinaryOp extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary, binary), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType
}

/** `graft_theta_intersect(a, b)` — |A ∩ B| estimate. */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
  extends ThetaBinaryOp {
  override def prettyName: String = "graft_theta_intersect"
  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaEval.intersect(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ThetaEval.intersect($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersectEstimate =
    copy(left = newLeft, right = newRight)
}

/** `graft_theta_anotb(a, b)` — |A \ B| estimate. */
case class ThetaAnotBEstimate(left: Expression, right: Expression)
  extends ThetaBinaryOp {
  override def prettyName: String = "graft_theta_anotb"
  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaEval.aNotB(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ThetaEval.aNotB($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaAnotBEstimate =
    copy(left = newLeft, right = newRight)
}

/** `graft_theta_union_est(a, b)` — |A ∪ B| estimate (pairwise scalar;
  * consistent with intersect for Jaccard = ∩/∪). */
case class ThetaUnionEstimate(left: Expression, right: Expression)
  extends ThetaBinaryOp {
  override def prettyName: String = "graft_theta_union_est"
  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaEval.unionEst(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ThetaEval.unionEst($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaUnionEstimate =
    copy(left = newLeft, right = newRight)
}

object ThetaEval {
  private def wrap(b: Array[Byte]): Sketch = Sketch.wrap(Memory.wrap(b))

  def estimate(b: Array[Byte]): Double = wrap(b).getEstimate

  def intersect(a: Array[Byte], b: Array[Byte]): Double =
    SetOperation.builder().buildIntersection()
      .intersect(wrap(a), wrap(b)).getEstimate

  def aNotB(a: Array[Byte], b: Array[Byte]): Double =
    SetOperation.builder().buildANotB()
      .aNotB(wrap(a), wrap(b)).getEstimate

  def unionEst(a: Array[Byte], b: Array[Byte]): Double = {
    val u = SetOperation.builder().buildUnion()
    u.union(wrap(a))
    u.union(wrap(b))
    u.getResult.getEstimate
  }
}
