package graft

import graft.functions.ZOrderKey
import graft.operators.Layout
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** Z-order clustering: unit semantics of the native key expression plus
  * the measured multi-column pruning table RowGroupPruningSpec can't
  * show (it proves a LINEAR sort prunes its one sort column and nothing
  * else; this spec proves the Z-layout bounds EVERY clustered column).
  *
  * Layouts under test — same 400 k rows, same 64 KB row groups, one
  * file each:
  *   - linear-x: sorted by (x, y) — the classic single-column layout;
  *   - zorder(x, y): Layout.zorderWrite, 64 equi-depth buckets/column.
  * Witness: the parquet scan's own numOutputRows (rows surviving
  * row-group stats skipping, before Spark's post-scan Filter).
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  // --- unit: bucketOf is the upper-bound rank, NaN/null sort first ---

  test("bucketOf = count of cut points <= v (linear-scan oracle)") {
    val cuts = Array(-3.0, 0.0, 0.0, 2.5, 7.0)
    val probes = Seq(-10.0, -3.0, -2.9, 0.0, 1.0, 2.5, 6.9, 7.0, 99.0,
      Double.NaN, Double.NegativeInfinity, Double.PositiveInfinity)
    probes.foreach { v =>
      val expect = if (v.isNaN) 0L else cuts.count(_ <= v).toLong
      assert(ZOrderKey.bucketOf(cuts, v) == expect, s"v=$v")
    }
  }

  test("interleave: known values, clamping, and bit budget") {
    // 2 cols, 31 bits each: (1,0)->bit pattern 10, (0,1)->01, (1,1)->11
    assert(ZOrderKey.interleave(Array(1L, 0L), 31) == 2L)
    assert(ZOrderKey.interleave(Array(0L, 1L), 31) == 1L)
    assert(ZOrderKey.interleave(Array(1L, 1L), 31) == 3L)
    // MSB-first: col0's high bit outranks everything below it
    val top = ZOrderKey.interleave(Array(1L << 30, 0L), 31)
    val rest = ZOrderKey.interleave(Array((1L << 30) - 1, (1L << 30) - 1), 31)
    assert(top > rest)
    // out-of-range ids clamp (never wrap)
    assert(ZOrderKey.interleave(Array(Long.MaxValue, 0L), 4) ==
      ZOrderKey.interleave(Array(15L, 0L), 4))
    assert(ZOrderKey.interleave(Array(-5L, 0L), 4) ==
      ZOrderKey.interleave(Array(0L, 0L), 4))
    // never negative
    assert(ZOrderKey.interleave(Array(Long.MaxValue, Long.MaxValue), 31) >= 0L)
  }

  test("interleave round-trips: de-interleaving recovers the bucket ids") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val n = 2 + rnd.nextInt(3) // 2..4 columns
      val bitsPer = 63 / n
      val ids = Array.fill(n)(rnd.nextLong().abs & ((1L << bitsPer) - 1))
      val z = ZOrderKey.interleave(ids, bitsPer)
      // bit b (from MSB) of column i sits at z-bit (bitsPer-1-b)*n + (n-1-i)
      val back = Array.tabulate(n) { i =>
        (0 until bitsPer).foldLeft(0L) { (acc, b) =>
          (acc << 1) | ((z >>> ((bitsPer - 1 - b) * n + (n - 1 - i))) & 1L)
        }
      }
      assert(back.toSeq == ids.toSeq, s"ids=${ids.toSeq} z=$z")
    }
  }

  test("expression end-to-end equals the model; analysis-time guards fire") {
    val cutsX = Array(10.0, 20.0, 30.0)
    val cutsY = Array(5.0)
    val df = Seq((0.0, 0.0), (15.0, 7.0), (25.0, 3.0), (99.0, 99.0))
      .toDF("x", "y")
      .select($"x", $"y", call_function("graft_zorder",
        $"x", lit(cutsX), $"y", lit(cutsY)).as("z"))
    val got = df.collect().map(r =>
      ((r.getDouble(0), r.getDouble(1)), r.getLong(2))).toMap // keyed by (x,y)
    def model(x: Double, y: Double) = ZOrderKey.interleave(
      Array(cutsX.count(_ <= x).toLong, cutsY.count(_ <= y).toLong), 31)
    got.foreach { case ((x, y), z) => assert(z == model(x, y), s"($x,$y)") }
    // null value → bucket 0, key non-null
    val withNull = Seq((Some(15.0), Option.empty[Double])).toDF("x", "y")
      .select(call_function("graft_zorder",
        $"x", lit(cutsX), $"y", lit(cutsY)).as("z"))
    assert(withNull.head().getLong(0) == model(15.0, -1e300))
    // too many cuts for the per-column bit budget → loud analysis error:
    // 10 columns → 6 bits each → at most 63 cut points; give 70
    val args: Seq[org.apache.spark.sql.Column] =
      Seq($"a", lit((1 to 70).map(_.toDouble).toArray)) ++
        (1 to 9).flatMap(_ => Seq($"b", lit(Array(1.0))))
    val err = intercept[Exception] {
      Seq((1.0, 2.0)).toDF("a", "b")
        .select(call_function("graft_zorder", args: _*)).collect()
    }
    assert(err.getMessage.contains("cut points") ||
      err.getMessage.contains("bits"), err.getMessage)
  }

  test("cutPoints: equi-depth boundaries split a skewed column evenly") {
    val df = spark.range(10000)
      .select((($"id" * $"id") % 1000003).cast("double").as("v"))
    val cuts = Layout.cutPoints(df, Seq("v"), buckets = 8, relErr = 0.001)("v")
    assert(cuts.length <= 7 && cuts.length >= 3) // distinct-deduped
    assert(cuts.sorted.toSeq == cuts.toSeq)
    // each bucket holds roughly n/8
    val withB = df.select(ZOrderSpec.bucketCol($"v", cuts).as("b"))
      .groupBy("b").count().collect().map(_.getLong(1))
    assert(withB.forall(c => c > 10000 / 16 && c < 10000 / 4), withB.toSeq)
  }

  // --- the measurement: multi-column row-group pruning ---

  private val n = 400000L
  private val blockSize = 64 * 1024
  private val buckets = 64

  private lazy val dirs: (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("graft_zo").toString
    // x, y independent uniform in [0, 1000)
    val rows = spark.range(n).select(
      $"id".as("event_id"),
      pmod($"id", lit(1000)).cast("int").as("x"),
      pmod(hash($"id"), lit(1000)).cast("int").as("y"))
    rows.coalesce(1).sortWithinPartitions($"x", $"y")
      .write.option("parquet.block.size", blockSize)
      .parquet(s"$base/linear")
    val cuts = Layout.cutPoints(rows, Seq("x", "y"), buckets)
    Layout.zorderWrite(
      rows, Seq(col("x") -> cuts("x"), col("y") -> cuts("y")),
      numFiles = 1, path = s"$base/zorder",
      options = Map("parquet.block.size" -> blockSize.toString))
    (s"$base/linear", s"$base/zorder")
  }

  private def q(dir: String, pred: org.apache.spark.sql.Column) =
    spark.read.parquet(dir).filter(pred)

  private def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f }
      .getOrElse(fail("no FileSourceScanExec leaf"))
    df.collect()
    scan.metrics("numOutputRows").value
  }

  private def xPred = $"x" >= 100 && $"x" < 200   // 10 % of x-space
  private def yPred = $"y" >= 100 && $"y" < 200   // 10 % of y-space

  test("z-order layout bounds BOTH columns; linear sort bounds only its own") {
    val (linear, zorder) = dirs
    // identical contents first — layout must not change results
    Seq(xPred, yPred, xPred && yPred).foreach { p =>
      val a = q(linear, p).select("event_id").as[Long].collect().sorted.toSeq
      val b = q(zorder, p).select("event_id").as[Long].collect().sorted.toSeq
      assert(a.nonEmpty && a == b)
    }
    val linX = scanRows(q(linear, xPred))
    val linY = scanRows(q(linear, yPred))
    val linBox = scanRows(q(linear, xPred && yPred))
    val zX = scanRows(q(zorder, xPred))
    val zY = scanRows(q(zorder, yPred))
    val zBox = scanRows(q(zorder, xPred && yPred))
    info(f"linear: x=$linX y=$linY box=$linBox   zorder: x=$zX y=$zY box=$zBox  (n=$n)")
    // linear: great on the sort column, blind on the other
    assert(linX < n / 5, s"linear x-slice read $linX of $n")
    assert(linY > n * 9 / 10, s"linear layout should NOT prune y (read $linY)")
    // z-order: every clustered column bounded — no 100 % column left
    assert(zX < n / 2, s"zorder x-slice read $zX of $n")
    assert(zY < n / 2, s"zorder y-slice read $zY of $n")
    // conjunctive box: multiplicative pruning, beats the linear layout
    assert(zBox < linBox, s"zorder box $zBox !< linear box $linBox")
    assert(zBox < n / 10, s"zorder box read $zBox of $n")
  }
}

object ZOrderSpec {
  /** Declarative bucket id (test oracle only — production path is the
    * native expression): count of cuts <= v via a fold. */
  def bucketCol(v: org.apache.spark.sql.Column,
                cuts: Array[Double]): org.apache.spark.sql.Column =
    aggregate(lit(cuts), lit(0L),
      (acc, c) => acc + when(c <= v, 1L).otherwise(0L))
}
