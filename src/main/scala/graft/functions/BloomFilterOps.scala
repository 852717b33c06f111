package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** Bloom-filter build aggregate: `graft_bloom(item, expectedItems, fpp)`
  * folds a string column into a serialized bloom filter (`binary`).
  *
  * This is the membership half of the bloom-prefiltered anti-join
  * (ext/BloomPrune): at 100 TB, "drop every row whose key is in a
  * blocklist" as a plain anti-join shuffles the ENTIRE big side on the
  * key; a bloom filter of the blocklist routes the ~no-hit majority
  * around the exchange entirely, and only possible hits (true matches +
  * the fpp sliver) reach the exact join. Same idea as Spark's own
  * runtime row-group filtering (`BloomFilterAggregate` /
  * `BloomFilterMightContain`) — those are long-hash-specialized
  * internals wired to the join planner, so the string-keyed, explicitly
  * invokable form is built here on the public
  * `org.apache.spark.util.sketch.BloomFilter`.
  *
  * Mergeable by construction (set bits OR together, so partial
  * aggregation applies and the blob is insertion-order independent);
  * null items are skipped, mirroring SQL anti-join semantics where a
  * null key never matches. State is O(bits) regardless of input rows.
  */
case class BloomAgg(itemExpr: Expression, itemsExpr: Expression,
                    fppExpr: Expression,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  private lazy val expectedItems: Long =
    itemsExpr.eval().asInstanceOf[Number].longValue()
  private lazy val fpp: Double =
    fppExpr.eval().asInstanceOf[Number].doubleValue()

  override def checkInputDataTypes(): TypeCheckResult =
    (itemExpr.dataType, itemsExpr.dataType, fppExpr.dataType) match {
      case (StringType, IntegerType | LongType, DoubleType) =>
        val nOk = itemsExpr.foldable && itemsExpr.eval() != null &&
          itemsExpr.eval().asInstanceOf[Number].longValue() > 0L
        val fOk = fppExpr.foldable && fppExpr.eval() != null && {
          val f = fppExpr.eval().asInstanceOf[Number].doubleValue()
          f > 0.0 && f < 1.0
        }
        if (nOk && fOk) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "expectedItems must be a positive literal and fpp a literal in (0, 1)")
      case (i, n, f) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom expects (string, bigint, double), got " +
          s"(${i.simpleString}, ${n.simpleString}, ${f.simpleString})")
    }

  override def children: Seq[Expression] = Seq(itemExpr, itemsExpr, fppExpr)

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = false

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(bf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = itemExpr.eval(input)
    if (v != null) bf.putBinary(v.asInstanceOf[UTF8String].getBytes)
    bf
  }

  // same (expectedItems, fpp) on every buffer → always compatible
  override def merge(bf: BloomFilter, other: BloomFilter): BloomFilter = {
    bf.mergeInPlace(other)
    bf
  }

  override def eval(bf: BloomFilter): Any = serialize(bf)

  override def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(itemExpr = newChildren(0), itemsExpr = newChildren(1),
      fppExpr = newChildren(2))

  override def prettyName: String = "graft_bloom"
}

/** `graft_bloom_contains(bloomBlob, item)` — membership probe against a
  * [[BloomAgg]] blob. The blob must be FOLDABLE (a literal — built once,
  * collected, and injected, the same contract as Spark's internal
  * `BloomFilterMightContain`): the filter then deserializes ONCE per
  * plan, not per row, and the probe is a codegen'd hash test.
  *
  * Never-null boolean: a null item returns false (a null key is never
  * in a blocklist — matches anti-join null semantics), and a null blob
  * means "empty blocklist", also false. False positives are possible by
  * construction (rate `fpp`); false negatives are not — callers use a
  * `false` result to SKIP exact work, never to conclude membership.
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) =>
        if (left.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "graft_bloom_contains requires a foldable (literal) bloom blob")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains expects (binary, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = BooleanType

  override def nullable: Boolean = false

  @transient private lazy val bloom: BloomFilter = {
    val b = left.eval()
    if (b == null) null
    else BloomFilter.readFrom(
      new ByteArrayInputStream(b.asInstanceOf[Array[Byte]]))
  }

  override def eval(input: InternalRow): Any = {
    val v = right.eval(input)
    if (bloom == null || v == null) false
    else bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", bloom,
      classOf[BloomFilter].getName)
    val itemGen = right.genCode(ctx)
    ev.copy(code =
      code"""
        ${itemGen.code}
        ${CodeGenerator.javaType(dataType)} ${ev.value} = false;
        if ($bf != null && !${itemGen.isNull}) {
          ${ev.value} = $bf.mightContainBinary(${itemGen.value}.getBytes());
        }
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_bloom_contains"
}
