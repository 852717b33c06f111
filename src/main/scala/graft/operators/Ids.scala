package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contiguous global row ids — `0 .. n-1` in `orderCols` order —
  * without the global-sort bottleneck. The naive forms both fail at
  * 100 TB: `row_number().over(Window.orderBy(...))` with no partition
  * key collapses the table into ONE task (Spark even warns), and
  * `monotonically_increasing_id` is neither contiguous nor
  * order-related. The scale shape is two bounded steps:
  *
  *   1. range-partition on `orderCols` (the same machinery every
  *      global sort uses — each partition owns a key range, partition
  *      index IS global order rank of the range);
  *   2. count rows per partition — a tiny aggregate whose result is
  *      numPartitions rows collected to the driver (the same bounded-
  *      collect class as the centroid fits), cumulated into prefix
  *      offsets, and broadcast-joined back; within-partition
  *      `row_number` + offset is the global id.
  *
  * The id-assignment work is fully distributed; the driver only ever
  * sees one count per partition. Ids are deterministic when
  * `orderCols` is a total order (unique keys); tied rows get arbitrary
  * relative ids, exactly like any SQL row_number tie. IdsSpec pins the
  * contiguity, the order property, and the no-single-partition plan.
  */
object Ids {

  def stableIds(df: DataFrame, orderCols: Seq[Column],
                idName: String = "row_id",
                numPartitions: Option[Int] = None): DataFrame = {
    require(orderCols.nonEmpty, "stableIds needs ordering columns")
    val spark = df.sparkSession
    val parts = numPartitions.getOrElse(
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
    // MUST be materialized once: repartitionByRange picks its boundaries
    // by sampling with a seed derived from the physical RDD id, so two
    // separate actions over the same lazy frame can land rows in
    // DIFFERENT partitions — the counts job and the id job would then
    // disagree and ids would collide. The library cache contract
    // (graft.Caching.persisted; caller releases after the terminal
    // action) pins one shuffled copy that both jobs read.
    val ranged = graft.Caching.persisted(df
      .repartitionByRange(parts, orderCols: _*)
      .withColumn("__pid", spark_partition_id()))
    // one tiny job: rows per range partition → prefix offsets (empty
    // partitions are simply absent and contribute 0)
    val counts = ranged.groupBy(col("__pid")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) {
      case ((_, acc), (pid, c)) => (pid, acc + c)
    }
    val offsetRows = counts.map(_._1).zip(offsets.map(_._2))
    val offsetDf = spark.createDataFrame(
        offsetRows.toSeq.map { case (p, o) => (p, o) })
      .toDF("__pid", "__offset")
    ranged
      .join(broadcast(offsetDf), Seq("__pid"))
      .withColumn(idName,
        row_number().over(
          Window.partitionBy(col("__pid")).orderBy(orderCols: _*))
          .cast("long") + col("__offset") - 1L)
      .drop("__pid", "__offset")
  }
}
