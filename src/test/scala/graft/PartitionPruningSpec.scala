package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** The 100 TB layout claim, as a red test (round-15 verdict, missing #1):
  * SURVEY §4 lays the full-scale events table out `partitionBy
  * (event_date)`, and `Tables` promises the reader handles that layout
  * unchanged. Every other plan pin runs on single-file parquet, so until
  * now partition PRUNING — the property that makes a ts-sliced query read
  * a day, not 100 TB — was an assertion. This spec writes a real
  * partitioned fixture from driver testdata, routes the read through the
  * same `Tables.eventsSliced` every query uses, and asserts (a) the
  * derived partition predicate reaches `PartitionFilters`, (b) the scan
  * opens strictly fewer files/partitions than the layout holds, and (c)
  * the rows are the same ones the flat layout returns.
  */
class PartitionPruningSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val start = "2024-01-10 00:00:00"
  private val end   = "2024-01-11 23:59:59"

  // one partitioned copy of the driver's events table, built once:
  // events.parquet/event_date=YYYY-MM-DD/part-*.parquet (repartitioned by
  // the partition column first → exactly one file per directory, so the
  // files-opened metric counts partitions)
  private lazy val dir: String = {
    assume(new java.io.File(s"$sf/events.parquet").exists(),
      s"driver testdata absent at $sf")
    val d = java.nio.file.Files.createTempDirectory("graft_part").toString
    val ev = Tables.events(spark, sf)
      .withColumn("event_date", to_date(col("ts")))
    ev.repartition(col("event_date"))
      .write.partitionBy("event_date").parquet(s"$d/events.parquet")
    d
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f }
      .getOrElse(fail("no FileSourceScanExec leaf in " +
        df.queryExecution.executedPlan))

  test("partitioned layout: ts slice prunes to the slice's day-partitions") {
    val sliced = Tables.eventsSliced(spark, dir, start, end)
    val scan = scanOf(sliced)
    val planStr = scan.toString

    // (a) the derived event_date bound is a PARTITION filter (directory
    // pruning), not a post-scan row filter
    assert(planStr.contains("PartitionFilters:"), planStr)
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(planStr).map(_.group(1)).getOrElse("")
    assert(pf.contains("event_date"), s"no event_date partition filter: $pf")

    // (b) strictly fewer partitions read than the layout holds: one file
    // per partition directory by construction, so files-read == partitions
    sliced.collect()
    val filesRead = scan.metrics("numFiles").value
    val totalParts = new java.io.File(s"$dir/events.parquet").listFiles()
      .count(_.getName.startsWith("event_date="))
    assert(totalParts > 2, s"fixture too small to prove pruning: $totalParts")
    assert(filesRead == 2,
      s"2-day slice should read exactly 2 of $totalParts partitions, read $filesRead")
  }

  test("partitioned layout: rows identical to the flat layout's slice") {
    val flat = Tables.eventsSliced(spark, sf, start, end)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val part = Tables.eventsSliced(spark, dir, start, end)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(part.nonEmpty, "slice returned no rows — pick in-range dates")
    assert(part == flat)
  }

  test("partitioned layout: unsliced read through Tables.events is unchanged") {
    // partition discovery is transparent: same row count, ts arrives as
    // TIMESTAMP either way (the fixture was written post-normalization)
    val n = Tables.events(spark, dir).count()
    assert(n == Tables.events(spark, sf).count())
  }
}
