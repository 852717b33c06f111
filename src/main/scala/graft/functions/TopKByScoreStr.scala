package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** String-keyed partial top-k aggregate:
  * `graft_topk_str(score, id, k)` keeps the k best (score DESC, id ASC
  * on ties) rows per group, best-first as
  * `array<struct<score:double, id:string>>` — [[TopKByScore]] for
  * string payloads (ranked terms, shingles, labels). Tie-break uses
  * `UTF8String.compare` (binary order), the same ordering Spark's
  * `orderBy(col)` window applies to strings, so the aggregate is
  * row-identical to the `row_number` window form (parity spec-tested).
  *
  * Same scale rationale as [[TopKByScore]]: the window form shuffles
  * and sorts EVERY scored row; this forwards at most k rows per group
  * per task. UTF8Strings are cloned on insert — Spark reuses the
  * backing buffers between input rows. */
case class TopKByScoreStr(scoreExpr: Expression, idExpr: Expression,
                          kExpr: Expression,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.PriorityQueue[(Double, UTF8String)]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  // worst-first so the heap head is the eviction candidate
  private implicit val worstFirst: Ordering[(Double, UTF8String)] =
    new Ordering[(Double, UTF8String)] {
      override def compare(a: (Double, UTF8String), b: (Double, UTF8String)): Int = {
        val c = java.lang.Double.compare(b._1, a._1) // lower score = greater
        if (c != 0) c else a._2.compareTo(b._2) // later string = greater
      }
    }

  override def checkInputDataTypes(): TypeCheckResult =
    (scoreExpr.dataType, idExpr.dataType) match {
      case (DoubleType, StringType) =>
        // validate k's TYPE before evaluating it: a foldable
        // non-integer literal ('3', 1.5, null) must fail analysis with
        // a TypeCheckFailure, not a ClassCastException/NPE from the
        // lazy `k` cast (round-7 advice)
        kExpr.dataType match {
          case IntegerType | LongType if kExpr.foldable =>
            // range-check the RAW value: `k` truncates via intValue(),
            // so a bigint past Int range would silently wrap (e.g.
            // 4294967301L → 5) if only `k > 0` were checked
            // (round-8 advice)
            kExpr.eval() match {
              case null => TypeCheckResult.TypeCheckFailure(
                "k must be a positive non-null integer literal")
              case v =>
                val kl = v.asInstanceOf[Number].longValue()
                if (kl > 0 && kl <= Int.MaxValue) TypeCheckResult.TypeCheckSuccess
                else TypeCheckResult.TypeCheckFailure(
                  s"k must be in [1, ${Int.MaxValue}], got $kl")
            }
          case _ => TypeCheckResult.TypeCheckFailure(
            s"k must be a foldable int/bigint literal, got " +
              kExpr.dataType.simpleString)
        }
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"graft_topk_str expects (double, string, int), got " +
          s"(${s.simpleString}, ${i.simpleString})")
    }

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, kExpr)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", StringType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): scala.collection.mutable.PriorityQueue[(Double, UTF8String)] =
    scala.collection.mutable.PriorityQueue.empty[(Double, UTF8String)]

  private def add(q: scala.collection.mutable.PriorityQueue[(Double, UTF8String)],
                  e: (Double, UTF8String)): Unit =
    if (q.size < k) q.enqueue(e)
    else if (worstFirst.compare(e, q.head) < 0) {
      q.dequeue(); q.enqueue(e)
    }

  override def update(q: scala.collection.mutable.PriorityQueue[(Double, UTF8String)],
                      input: InternalRow): scala.collection.mutable.PriorityQueue[(Double, UTF8String)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      add(q, (s.asInstanceOf[Double], i.asInstanceOf[UTF8String].clone()))
    q
  }

  override def merge(q: scala.collection.mutable.PriorityQueue[(Double, UTF8String)],
                     other: scala.collection.mutable.PriorityQueue[(Double, UTF8String)]): scala.collection.mutable.PriorityQueue[(Double, UTF8String)] = {
    other.foreach(add(q, _))
    q
  }

  override def eval(q: scala.collection.mutable.PriorityQueue[(Double, UTF8String)]): Any =
    new GenericArrayData(q.toArray.sorted(worstFirst)
      .map { case (s, i) => InternalRow(s, i) })

  override def serialize(q: scala.collection.mutable.PriorityQueue[(Double, UTF8String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(q.size)
    q.foreach { case (s, i) =>
      out.writeDouble(s)
      val b = i.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.PriorityQueue[(Double, UTF8String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val q = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val s = in.readDouble()
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      q.enqueue((s, UTF8String.fromBytes(b)))
    }
    q
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScoreStr =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScoreStr =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScoreStr =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1),
      kExpr = newChildren(2))

  override def prettyName: String = "graft_topk_str"
}
