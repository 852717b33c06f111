package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Mergeable quantile sketches (Apache DataSketches KLL, doubles).
  *
  * The quantile sibling of [[graft.ext.Sketches]]' HLL distinct-count
  * path, and the persistable complement of `approx_percentile` /
  * operators/Quantiles: Spark's own percentile sketch lives and dies
  * inside one aggregation — it cannot be stored at ingest and rolled up
  * later. `graft_kll` folds a double column into a ~KB-sized binary
  * sketch row; `graft_kll_merge` unions persisted sketch BYTES to any
  * coarser grouping (month, source, global) without re-reading raw
  * data; `graft_kll_quantile` / `graft_kll_rank` read estimates out of
  * a blob. At 100 TB: per-shard length/quality/score distributions are
  * computed once at ingest, and every later "p99 token count per
  * source" is a bytes-only rollup.
  *
  * Accuracy is a NORMALIZED RANK guarantee (KLL's contract): k=200
  * bounds single-sided rank error at ~1.65 % with 99 % confidence, and
  * merging never degrades the bound below the smallest k involved.
  * Estimates are not run-deterministic (KLL compaction flips random
  * coins), so tests and callers must assert within the rank-error band,
  * not bit-equality — the honest contract QuantileSketchSpec pins.
  * Null inputs are skipped, mirroring SQL aggregate semantics; an
  * empty group yields an empty sketch (quantile reads return NaN).
  */
case class KllAgg(valueExpr: Expression, kExpr: Expression,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    (valueExpr.dataType, kExpr.dataType) match {
      case (DoubleType, IntegerType) =>
        val kOk = kExpr.foldable && kExpr.eval() != null && {
          val kv = kExpr.eval().asInstanceOf[Number].intValue()
          kv >= 8 && kv <= 65535 // KLL's own legal range
        }
        if (kOk) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "graft_kll k must be a literal int in [8, 65535]")
      case (v, kk) => TypeCheckResult.TypeCheckFailure(
        s"graft_kll expects (double, int), got " +
          s"(${v.simpleString}, ${kk.simpleString})")
    }

  override def children: Seq[Expression] = Seq(valueExpr, kExpr)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(sk: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = valueExpr.eval(input)
    if (v != null) sk.update(v.asInstanceOf[Double])
    sk
  }

  override def merge(sk: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    sk.merge(other)
    sk
  }

  override def eval(sk: KllDoublesSketch): Any = sk.toByteArray

  override def serialize(sk: KllDoublesSketch): Array[Byte] = sk.toByteArray

  // heapify gives a read-only view of a compact image; merge into a
  // fresh updatable instance so the buffer stays writable either way
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    val fresh = KllDoublesSketch.newHeapInstance(k)
    fresh.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
    fresh
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllAgg =
    copy(valueExpr = newChildren(0), kExpr = newChildren(1))
  override def prettyName: String = "graft_kll"
}

/** Bytes-only rollup: `graft_kll_merge(sketchBlob, k)` unions persisted
  * [[KllAgg]] blobs. `k` sizes the merge buffer — match the ingest k
  * (merging into a smaller-k buffer legally degrades to that k's
  * accuracy; KLL's bound follows the smallest k in the merge tree). */
case class KllMergeAgg(sketchExpr: Expression, kExpr: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    (sketchExpr.dataType, kExpr.dataType) match {
      case (BinaryType, IntegerType) =>
        val kOk = kExpr.foldable && kExpr.eval() != null && {
          val kv = kExpr.eval().asInstanceOf[Number].intValue()
          kv >= 8 && kv <= 65535
        }
        if (kOk) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "graft_kll_merge k must be a literal int in [8, 65535]")
      case (s, kk) => TypeCheckResult.TypeCheckFailure(
        s"graft_kll_merge expects (binary, int), got " +
          s"(${s.simpleString}, ${kk.simpleString})")
    }

  override def children: Seq[Expression] = Seq(sketchExpr, kExpr)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(sk: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val blob = sketchExpr.eval(input)
    if (blob != null)
      sk.merge(KllDoublesSketch.heapify(
        Memory.wrap(blob.asInstanceOf[Array[Byte]])))
    sk
  }

  override def merge(sk: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    sk.merge(other)
    sk
  }

  override def eval(sk: KllDoublesSketch): Any = sk.toByteArray
  override def serialize(sk: KllDoublesSketch): Array[Byte] = sk.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    val fresh = KllDoublesSketch.newHeapInstance(k)
    fresh.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
    fresh
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllMergeAgg =
    copy(sketchExpr = newChildren(0), kExpr = newChildren(1))
  override def prettyName: String = "graft_kll_merge"
}

/** `graft_kll_quantile(blob, q)` — the INCLUSIVE q-quantile estimate of
  * a sketch blob; NaN for an empty sketch, null in → null out. The blob
  * is deserialized per call — these run on AGGREGATED rows (one per
  * group), never on raw data. */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_kll_quantile expects (binary, double), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_kll_quantile"

  override def nullSafeEval(blob: Any, q: Any): Any =
    KllEval.quantile(blob.asInstanceOf[Array[Byte]], q.asInstanceOf[Double])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, q) =>
      s"graft.functions.KllEval.quantile($b, $q)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}

/** `graft_kll_rank(blob, value)` — the INCLUSIVE normalized rank of
  * `value` (the fraction of sketched input ≤ value): "what share of
  * docs score under the threshold" without a scan. */
case class KllRank(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_kll_rank expects (binary, double), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_kll_rank"

  override def nullSafeEval(blob: Any, v: Any): Any =
    KllEval.rank(blob.asInstanceOf[Array[Byte]], v.asInstanceOf[Double])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, v) =>
      s"graft.functions.KllEval.rank($b, $v)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllRank =
    copy(left = newLeft, right = newRight)
}

object KllEval {
  def quantile(blob: Array[Byte], q: Double): Double = {
    val sk = KllDoublesSketch.wrap(Memory.wrap(blob))
    if (sk.isEmpty) Double.NaN
    else sk.getQuantile(q, QuantileSearchCriteria.INCLUSIVE)
  }

  def rank(blob: Array[Byte], v: Double): Double = {
    val sk = KllDoublesSketch.wrap(Memory.wrap(blob))
    if (sk.isEmpty) Double.NaN
    else sk.getRank(v, QuantileSearchCriteria.INCLUSIVE)
  }
}
