package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd Z-order (Morton) clustering key:
  * `graft_zorder(v1, cuts1, v2, cuts2, ...)` → non-negative long.
  *
  * Each `(value: double, cuts: array<double> literal)` pair is mapped to
  * an equi-depth bucket id (binary search over the sorted cut points —
  * `cuts` are the buckets−1 internal boundaries, so the id lands in
  * `[0, cuts.length]`), and the per-column ids are bit-interleaved
  * MSB-first into one long. Sorting a table by this key gives every row
  * group a narrow range in EVERY participating column at once, which is
  * what multi-dimensional min/max row-group pruning needs: a linear
  * sort by column A clusters A and destroys B (RowGroupPruningSpec
  * shows the shuffled-layout failure mode), while the Z-curve's
  * locality bounds each column's spread per run of consecutive keys.
  * This is the standard layout lever behind Delta/Iceberg OPTIMIZE
  * ZORDER, built here as a pure write-time expression — the reader
  * needs nothing, the parquet stats do the work (ZOrderSpec measures
  * the read fractions; operators/Layout.scala is the writer-side API).
  *
  * Contract details:
  *   - cut arrays must be FOLDABLE (literals — fitted once via
  *     `Layout.cutPoints`, a bounded driver collect like the k-means
  *     centroid fits) and sorted ascending; they deserialize once per
  *     plan, not per row.
  *   - bits per column = 63 / nCols, so every key is non-negative and
  *     column count × bucket count is bounded loudly at analysis time
  *     (`cuts.length` must fit its column's bit budget).
  *   - null / NaN values take bucket 0 (sorts first, like NULLS FIRST);
  *     the key itself is never null.
  */
case class ZOrderKey(children: Seq[Expression]) extends Expression {

  private def nCols = children.size / 2

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.size < 4 || children.size % 2 != 0)
      return TypeCheckResult.TypeCheckFailure(
        "graft_zorder expects (value, cuts) pairs for 2+ columns")
    val bitsPer = 63 / nCols
    children.grouped(2).zipWithIndex.foldLeft(
      TypeCheckResult.TypeCheckSuccess: TypeCheckResult) {
      case (ok @ TypeCheckResult.TypeCheckSuccess, (Seq(v, cuts), i)) =>
        (v.dataType, cuts.dataType) match {
          case (DoubleType, ArrayType(DoubleType, _)) =>
            if (!cuts.foldable) TypeCheckResult.TypeCheckFailure(
              s"graft_zorder cuts for column $i must be a literal array")
            else {
              val arr = cuts.eval()
              if (arr == null) TypeCheckResult.TypeCheckFailure(
                s"graft_zorder cuts for column $i must not be null")
              else if (arr.asInstanceOf[ArrayData].numElements() >= (1L << bitsPer))
                TypeCheckResult.TypeCheckFailure(
                  s"graft_zorder column $i has ${arr.asInstanceOf[ArrayData].numElements()} " +
                    s"cut points but only $bitsPer bits are available for $nCols columns " +
                    s"(max ${(1L << bitsPer) - 1})")
              else ok
            }
          case (vt, ct) => TypeCheckResult.TypeCheckFailure(
            s"graft_zorder column $i expects (double, array<double>), got " +
              s"(${vt.simpleString}, ${ct.simpleString})")
        }
      case (fail, _) => fail
    }
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_zorder"

  // cut arrays are foldable: materialize once per plan
  @transient private lazy val cutArrays: Array[Array[Double]] =
    children.grouped(2).map { case Seq(_, cuts) =>
      cuts.eval().asInstanceOf[ArrayData].toDoubleArray()
    }.toArray

  @transient private lazy val valueExprs: Array[Expression] =
    children.grouped(2).map(_.head).toArray

  override def eval(input: InternalRow): Any = {
    val n = nCols
    val bitsPer = 63 / n
    val buckets = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = valueExprs(i).eval(input)
      buckets(i) =
        if (v == null) 0L
        else ZOrderKey.bucketOf(cutArrays(i), v.asInstanceOf[Double])
      i += 1
    }
    ZOrderKey.interleave(buckets, bitsPer)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = nCols
    val bitsPer = 63 / n
    val cutsRef = ctx.addReferenceObj("zorderCuts", cutArrays, "double[][]")
    val bucketsVar = ctx.freshName("zBuckets")
    val valueCodes = valueExprs.zipWithIndex.map { case (v, i) =>
      val g = v.genCode(ctx)
      s"""
        ${g.code}
        $bucketsVar[$i] = ${g.isNull}
          ? 0L
          : graft.functions.ZOrderKey.bucketOf($cutsRef[$i], ${g.value});
      """
    }
    ev.copy(code =
      code"""
        long[] $bucketsVar = new long[$n];
        ${valueCodes.mkString("\n")}
        long ${ev.value} =
          graft.functions.ZOrderKey.interleave($bucketsVar, $bitsPer);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderKey =
    copy(children = newChildren)
}

object ZOrderKey {

  /** Equi-depth bucket id: the count of cut points ≤ v (upper-bound
    * binary search). NaN compares false against every cut → bucket 0. */
  def bucketOf(cuts: Array[Double], v: Double): Long = {
    var lo = 0
    var hi = cuts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cuts(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  /** MSB-first bit interleave of `buckets`, `bitsPer` bits each: the
    * result's top bit cycle is (col0 MSB, col1 MSB, …), so all columns
    * split the keyspace at every level of the curve. Out-of-range ids
    * are clamped (not masked — masking would wrap and break the
    * monotone bucket→key order). */
  def interleave(buckets: Array[Long], bitsPer: Int): Long = {
    val max = (1L << bitsPer) - 1L
    var z = 0L
    var b = bitsPer - 1
    while (b >= 0) {
      var i = 0
      while (i < buckets.length) {
        val v = if (buckets(i) < 0L) 0L
                else if (buckets(i) > max) max
                else buckets(i)
        z = (z << 1) | ((v >>> b) & 1L)
        i += 1
      }
      b -= 1
    }
    z
  }
}
