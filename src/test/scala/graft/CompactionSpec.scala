package graft

import graft.operators.Layout
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Small-files compaction (Layout.compact) + schema-evolution reads —
  * the two maintenance behaviors an incrementally-ingested 100 TB
  * directory depends on:
  *
  *   1. many tiny appended files rewrite into target-sized files
  *      (coalesce = shuffle-free; sort form re-establishes the
  *      row-group clustering RowGroupPruningSpec proved scans need);
  *   2. a column added mid-stream (v2 files carry it, v1 files don't)
  *      reads through mergeSchema with nulls for the old files, and
  *      pushdown on the always-present columns still reaches the scan.
  */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private val n = 200000L

  test("coalesce form: tiny appended files become few files, no shuffle") {
    val base = java.nio.file.Files.createTempDirectory("graft_cmp").toString
    // 64 tiny "per-batch append" files
    spark.range(n).select($"id", ($"id" % 97).cast("double").as("v"))
      .repartition(64).write.parquet(s"$base/in")
    val df = spark.read.parquet(s"$base/in")
    val (inFiles, outFiles) = Layout.compact(df, s"$base/in", s"$base/out",
      targetFileBytes = 1L << 20) // ~1 MB target at test scale
    assert(inFiles >= 64, s"fixture wrote $inFiles files")
    assert(outFiles < inFiles / 8, s"$inFiles -> $outFiles files")
    // no row lost, no shuffle paid
    assert(spark.read.parquet(s"$base/out").count() == n)
    val plan = df.coalesce(outFiles).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"coalesce form must not shuffle:\n$plan")
  }

  test("exact dedup on a text_hash-bucketed table runs with ZERO exchange") {
    // the 100 TB ingest story: persist the corpus bucketBy(text_hash)
    // once, and every subsequent hash-keyed dedup/group pass reads the
    // bucketed layout's HashPartitioning instead of re-shuffling the
    // corpus — the q23 aggregate with its one exchange deleted
    val docs = (0L until 2000L)
      .map(i => (i, s"text body number ${i % 700}"))
      .toDF("doc_id", "text")
      .withColumn("text_hash", md5($"text"))
    docs.write.mode("overwrite").bucketBy(4, "text_hash")
      .saveAsTable("graft_docs_bucketed")
    try {
      val deduped = spark.table("graft_docs_bucketed")
        .groupBy($"text_hash")
        .agg(count(lit(1)).as("n_copies"), min($"doc_id").as("keep_doc"))
      val plan = deduped.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed dedup must not shuffle:\n$plan")
      val rows = deduped.collect()
      assert(rows.length == 700)
      // keep-first: representative is the minimum doc_id of the group
      val keep = rows.map(r => r.getLong(2)).toSet
      assert(keep == (0L until 700L).toSet, "keep-first ids wrong")
    } finally spark.sql("DROP TABLE IF EXISTS graft_docs_bucketed")
  }

  test("sort form: compaction re-establishes row-group prunability") {
    val base = java.nio.file.Files.createTempDirectory("graft_cmps").toString
    graft.sources.Container.withMicrosTimestamps(spark) {
      // append-order drifted from ts order: 64 hash-ordered files
      spark.range(n).select(
          timestamp_seconds(lit(1700000000L) + $"id").as("ts"),
          $"id".as("event_id"))
        .repartition(64, $"event_id")
        .write.option("parquet.block.size", 64 * 1024).parquet(s"$base/in")
      val df = spark.read.parquet(s"$base/in")
      val (_, outFiles) = Layout.compact(df, s"$base/in", s"$base/out",
        targetFileBytes = 4L << 20, sortCols = Seq(col("ts")),
        // keep row groups fine-grained so the pruning check below sees
        // group-level (not file-level) granularity at test scale
        options = Map("parquet.block.size" -> (64 * 1024).toString))
      assert(outFiles >= 1)
    }
    def sliceRows(dir: String): Long = {
      val q = spark.read.parquet(dir).filter(
        $"ts" >= timestamp_seconds(lit(1700000000L + 100000)) &&
          $"ts" <= timestamp_seconds(lit(1700000000L + 102000)))
      val scan = q.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case f: FileSourceScanExec => f }.get
      q.collect(); scan.metrics("numOutputRows").value
    }
    val before = sliceRows(s"$base/in")
    val after = sliceRows(s"$base/out")
    // drifted layout reads ~everything; compacted+sorted reads ~slice
    assert(before > n / 2, s"drifted layout unexpectedly pruned: $before")
    assert(after < n / 10, s"compacted layout did not regain pruning: $after")
    assert(spark.read.parquet(s"$base/out").count() == n)
  }

  test("schema evolution: v1 files read beside v2 via mergeSchema, pushdown intact") {
    val base = java.nio.file.Files.createTempDirectory("graft_schev").toString
    spark.range(100).select($"id", ($"id" * 2).as("v"))
      .write.parquet(s"$base/d/batch=1")
    spark.range(100, 200).select($"id", ($"id" * 2).as("v"),
        concat(lit("l"), $"id" % 3).as("label")) // the NEW column
      .write.parquet(s"$base/d/batch=2")
    val df = spark.read.option("mergeSchema", "true").parquet(s"$base/d")
    assert(df.columns.toSet == Set("id", "v", "label", "batch"))
    // old files surface the new column as null
    val old = df.filter($"batch" === 1)
    assert(old.count() == 100 && old.filter($"label".isNull).count() == 100)
    val nw = df.filter($"batch" === 2 && $"label" === "l0")
    assert(nw.count() > 0)
    // pushdown on an always-present column reaches the scan
    val q = df.filter($"id" >= 150)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(id), GreaterThanOrEqual(id,150)"),
      scan)
    assert(q.count() == 50)
  }
}
