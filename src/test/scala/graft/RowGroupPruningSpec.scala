package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** The intra-file half of the 100 TB scan story. PartitionPruningSpec
  * proves directory-level pruning (a day-slice opens only the slice's
  * partitions); this spec proves the min/max row-group statistics layer
  * UNDER it: within a file, a pushed ts-range filter must skip the row
  * groups whose stats exclude the range — which only works if the data
  * is clustered on the filter column. Same rows, two layouts:
  *
  *   - ts-SORTED file (what an ingest pipeline that sorts-within-
  *     partitions produces): each row group covers a narrow ts band →
  *     a 1 % slice reads ~1 % of the file;
  *   - SHUFFLED file (hash-ordered): every row group spans the whole ts
  *     range → stats exclude nothing and the scan reads every row.
  *
  * The scan's own numOutputRows metric (rows the parquet reader emits
  * after row-group/page skipping, before Spark's post-scan Filter) is
  * the witness. At 100 TB this is the difference between "a slice query
  * reads a slice" and "every query reads the table", and it is a LAYOUT
  * property, not a reader property — hence the writer-side sort is part
  * of the library's documented ingest shape (Container/ShardExport).
  */
class RowGroupPruningSpec extends SparkSpec {
  import spark.implicits._

  private val n = 400000L
  // ~22 bytes/row raw → 64 KB row groups give dozens of groups per file
  private val blockSize = 64 * 1024

  private lazy val dirs: (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("graft_rg").toString
    // Spark's DEFAULT parquet timestamp encoding is INT96, which carries
    // NO min/max statistics — a ts-sorted INT96 layout silently reads
    // every row group (measured here before this conf was set: 400 k of
    // 400 k). MICROS is mandatory for a prunable time-series layout;
    // the same helper Container uses for its own writes pins it here,
    // so this spec exercises the library's actual write path.
    graft.sources.Container.withMicrosTimestamps(spark) {
      val rows = spark.range(n).select(
        timestamp_seconds(lit(1700000000L) + $"id").as("ts"),
        $"id".as("event_id"),
        ($"id" % 97).cast("double").as("value"))
      rows.coalesce(1).sortWithinPartitions($"ts")
        .write.option("parquet.block.size", blockSize)
        .parquet(s"$base/sorted")
      rows.orderBy(md5($"id".cast("string"))).coalesce(1)
        .write.option("parquet.block.size", blockSize)
        .parquet(s"$base/shuffled")
    }
    (s"$base/sorted", s"$base/shuffled")
  }

  // inclusive 1 %-of-span slice, mid-range
  private def sliced(dir: String) = {
    val start = 1700000000L + 200000L
    val end = start + (n / 100)
    spark.read.parquet(dir)
      .filter($"ts" >= timestamp_seconds(lit(start)) &&
        $"ts" <= timestamp_seconds(lit(end)))
  }

  private def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f }
      .getOrElse(fail("no FileSourceScanExec leaf"))
    df.collect()
    scan.metrics("numOutputRows").value
  }

  test("ts-sorted layout: row-group stats confine a 1 % slice to ~1 % of rows") {
    val p = sliced(dirs._1).queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: ["), p) // the filter reaches the scan
    val sortedRows = scanRows(sliced(dirs._1))
    val shuffledRows = scanRows(sliced(dirs._2))
    // same query, same rows out — only the layout differs
    assert(sliced(dirs._1).count() == sliced(dirs._2).count())
    assert(shuffledRows == n,
      s"shuffled layout should defeat stats pruning (read all $n), read $shuffledRows")
    assert(sortedRows < n / 10,
      s"sorted layout read $sortedRows of $n rows — row-group pruning not engaging " +
        "(stats missing, or row groups too coarse for the slice)")
  }

  test("both layouts return identical slice contents") {
    val a = sliced(dirs._1).select("event_id").as[Long].collect().sorted.toSeq
    val b = sliced(dirs._2).select("event_id").as[Long].collect().sorted.toSeq
    assert(a.nonEmpty && a == b)
  }
}
