package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe replacements for the two unpartitioned-window shapes —
  * `agg(...).over(Window.partitionBy())` (a global scalar) and
  * `sum(...).over(Window.orderBy(...))` (a global running total). Both
  * window forms move their whole input frame into ONE task (Spark
  * warns "Moving all data to a single partition"); legal over a
  * bounded histogram, but a silent scale cliff the moment a refactor
  * widens the frame — so the round-20 discipline is zero unpartitioned
  * windows anywhere, with these as the replacements (r19 verdict #4).
  *
  * [[withScalars]] is the q167-proven scalar pattern: persist the
  * frame once (both the value branch and the 1-row aggregate read the
  * cache — never a double scan), aggregate to one row, broadcast-cross-
  * join it back. Work is a map-side-combined aggregate; nothing ever
  * single-partitions.
  *
  * [[runningLong]] is the [[Ids.stableIds]] prefix machinery applied
  * to sums instead of counts: range-partition on the order key,
  * per-partition running sum (window partitioned by the partition id),
  * then add each partition's broadcast prefix offset. The driver only
  * ever sees one subtotal per partition — the same bounded-collect
  * class as stableIds — so the shape holds at any frame size.
  */
object GlobalAgg {

  /** `df` plus one column per `(aggExpr, name)` holding the global
    * aggregate of the WHOLE frame — the distributed form of
    * `aggExpr.over(Window.partitionBy())`. `df` is persisted via the
    * [[graft.Caching]] contract (caller releases after its terminal
    * action); the 1-row aggregate side is explicitly broadcast, so the
    * join is a one-row BroadcastNestedLoopJoin, never a shuffle.
    * Empty-frame semantics match the window form: no rows in, no rows
    * out. */
  def withScalars(df: DataFrame, aggs: (Column, String)*): DataFrame = {
    require(aggs.nonEmpty, "withScalars needs at least one aggregate")
    val cached = graft.Caching.persisted(df)
    val one = cached.agg(aggs.head._1.as(aggs.head._2),
      aggs.tail.map { case (c, n) => c.as(n) }: _*)
    cached.crossJoin(broadcast(one))
  }

  /** `df` plus an INCLUSIVE running total (unboundedPreceding ..
    * currentRow in `orderCols` order) for each `(valueCol, name)` in
    * `values`, and optionally the grand total as a literal column for
    * each entry of `grandTotals` (running-sum name → total column
    * name) — the totals are already known driver-side from the prefix
    * collect, so they cost nothing extra.
    *
    * Values must be integral (summed exactly as longs). `orderCols`
    * should be a total order of the frame (each of this library's call
    * sites orders by the DISTINCT key of the histogram beneath it);
    * rows tied on `orderCols` get an arbitrary relative prefix order,
    * exactly like any SQL running sum.
    *
    * The ranged copy is persisted ([[graft.Caching]] contract): the
    * subtotal job and the main job must read the SAME sampled range
    * boundaries. */
  def runningLong(df: DataFrame, orderCols: Seq[Column],
                  values: Seq[(Column, String)],
                  grandTotals: Map[String, String] = Map.empty,
                  numPartitions: Option[Int] = None): DataFrame = {
    require(values.nonEmpty, "runningLong needs at least one value column")
    require(grandTotals.keySet.subsetOf(values.map(_._2).toSet),
      s"grandTotals keys must name running-sum outputs: $grandTotals")
    val spark = df.sparkSession
    val parts = numPartitions.getOrElse(
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
    val vNames = values.indices.map(i => s"__cs$i")
    val base = values.zip(vNames).foldLeft(df) {
      case (acc, ((v, _), tmp)) => acc.withColumn(tmp, v.cast("long"))
    }
    val ranged = graft.Caching.persisted(base
      .repartitionByRange(parts, orderCols: _*)
      .withColumn("__pid", spark_partition_id()))
    // one tiny job: per-partition subtotals → exclusive prefix offsets
    // (empty partitions are absent and contribute 0)
    val subtotals = ranged.groupBy(col("__pid"))
      .agg(sum(col(vNames.head)).as("s0"),
        vNames.tail.zipWithIndex.map { case (n, i) =>
          sum(col(n)).as(s"s${i + 1}") }: _*)
      .collect()
      .map(r => (r.getInt(0), vNames.indices.map(i => r.getLong(i + 1))))
      .sortBy(_._1)
    val offsets = subtotals.scanLeft(
      (0, vNames.indices.map(_ => 0L): Seq[Long])) {
      case ((_, acc), (pid, ss)) => (pid, acc.zip(ss).map(t => t._1 + t._2))
    }
    val totals = offsets.last._2 // grand totals, driver-side
    val offsetRows = subtotals.map(_._1).zip(offsets.map(_._2))
    val offsetDf = spark.createDataFrame(
        offsetRows.toSeq.map { case (p, os) => (p, os) })
      .toDF("__pid", "__os")
      .select(col("__pid") +:
        vNames.indices.map(i => col("__os")(i).as(s"__off$i")): _*)
    // explicit ROWS frame (advisor r20): the default RANGE frame is
    // peer-inclusive on orderCols ties, which differs from the
    // rowsBetween window forms this operator replaced; live call sites
    // order by distinct histogram keys (identical either way), the
    // explicit frame makes the scaladoc's tie contract true in general
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = ranged.join(broadcast(offsetDf), Seq("__pid"))
    val withRuns = values.zipWithIndex.foldLeft(joined) {
      case (acc, ((_, name), i)) =>
        acc.withColumn(name,
          sum(col(s"__cs$i")).over(w) + col(s"__off$i"))
    }
    val withTotals = values.zipWithIndex.foldLeft(withRuns) {
      case (acc, ((_, name), i)) =>
        grandTotals.get(name).fold(acc)(tn =>
          acc.withColumn(tn, lit(totals(i))))
    }
    withTotals.drop("__pid" +: vNames.indices.flatMap(i =>
      Seq(s"__cs$i", s"__off$i")): _*)
  }
}
