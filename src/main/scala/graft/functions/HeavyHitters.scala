package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Misra–Gries heavy-hitters aggregate:
  * `graft_heavy_hitters(item, capacity)` summarizes the frequency
  * distribution of a string column per group in O(capacity) state and
  * returns the retained items as `array<struct<item:string,
  * count:bigint>>`, most-frequent first (ties: item ASC).
  *
  * Why not `groupBy(item).count()` + top-k: that shuffles one row per
  * DISTINCT item — for a heavy-tailed key column at fact scale (URLs,
  * user ids, shingles) the distinct set is itself huge. Misra–Gries is
  * a single pass with BOUNDED state, runs with map-side partial
  * aggregation, and its summaries merge associatively (Agarwal et al.,
  * "Mergeable Summaries", PODS'12): counts add, then the summary is
  * re-capped by subtracting the (capacity+1)-th largest count and
  * dropping non-positives.
  *
  * Guarantees (n = group size, k = capacity): every item with true
  * frequency > n/(k+1) is retained, and a retained item's reported
  * count undercounts its true frequency by at most n/(k+1); if the
  * group's distinct-item count never exceeds k, no decrement ever
  * fires and every count is EXACT — the property the oracle query uses
  * (same exact-for-oracle / bounded-for-scale split as Quantiles and
  * the Profiler distincts). Null items are skipped.
  */
case class HeavyHitters(itemExpr: Expression, capExpr: Expression,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashMap[String, Long]] {

  private lazy val cap: Int = capExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    (itemExpr.dataType, capExpr.dataType) match {
      case (StringType, IntegerType | LongType | ShortType) =>
        // type-check BEFORE evaluating the literal — a bare Number cast
        // would throw ClassCastException/NPE out of analysis for a
        // non-numeric or null capacity instead of this message. Bound
        // through longValue: intValue() would silently truncate a long
        // literal > 2^31 to its low 32 bits and run with a tiny cap.
        val capL = if (capExpr.foldable && capExpr.eval() != null)
          capExpr.eval().asInstanceOf[Number].longValue() else -1L
        if (capL > 0 && capL <= Int.MaxValue)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "capacity must be a positive literal <= Int.MaxValue")
      case (i, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_heavy_hitters expects (string, int), got " +
          s"(${i.simpleString}, ${c.simpleString})")
    }

  override def children: Seq[Expression] = Seq(itemExpr, capExpr)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): scala.collection.mutable.HashMap[String, Long] =
    scala.collection.mutable.HashMap.empty[String, Long]

  /** Classic MG step: count if tracked or space remains, else decrement
    * every counter (dropping zeros) — the "cancellation" that bounds
    * undercount by the number of decrement rounds <= n/(k+1). */
  private def offer(m: scala.collection.mutable.HashMap[String, Long],
                    item: String): Unit =
    m.get(item) match {
      case Some(c) => m.update(item, c + 1)
      case None if m.size < cap => m.update(item, 1L)
      case None =>
        val dead = scala.collection.mutable.ArrayBuffer[String]()
        m.foreach { case (i, c) => if (c == 1L) dead += i else m.update(i, c - 1) }
        dead.foreach(m.remove)
    }

  override def update(m: scala.collection.mutable.HashMap[String, Long],
                      input: InternalRow): scala.collection.mutable.HashMap[String, Long] = {
    val v = itemExpr.eval(input)
    if (v != null) offer(m, v.asInstanceOf[UTF8String].toString)
    m
  }

  override def merge(m: scala.collection.mutable.HashMap[String, Long],
                     other: scala.collection.mutable.HashMap[String, Long]): scala.collection.mutable.HashMap[String, Long] = {
    other.foreach { case (i, c) => m.update(i, m.getOrElse(i, 0L) + c) }
    if (m.size > cap) {
      // subtract the (cap+1)-th largest count, drop non-positives
      val d = m.values.toArray.sorted(Ordering[Long].reverse).apply(cap)
      val dead = scala.collection.mutable.ArrayBuffer[String]()
      m.foreach { case (i, c) =>
        if (c - d <= 0L) dead += i else m.update(i, c - d)
      }
      dead.foreach(m.remove)
    }
    m
  }

  override def eval(m: scala.collection.mutable.HashMap[String, Long]): Any = {
    val sorted = m.toArray.sortBy { case (i, c) => (-c, i) }
    new GenericArrayData(sorted.map { case (i, c) =>
      InternalRow(UTF8String.fromString(i), c)
    })
  }

  // length-prefixed raw UTF-8, not writeUTF — writeUTF throws on items
  // whose encoding exceeds 65535 bytes (real for document/URL columns)
  override def serialize(m: scala.collection.mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(m.size)
    m.foreach { case (i, c) =>
      val b = i.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val m = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      m.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(itemExpr = newChildren(0), capExpr = newChildren(1))

  override def prettyName: String = "graft_heavy_hitters"
}
