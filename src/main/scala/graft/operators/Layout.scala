package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-time multi-dimensional clustering (Z-order) — the layout lever
  * that makes row-group stats prune on MORE THAN ONE column.
  *
  * RowGroupPruningSpec establishes the single-column story: a ts-sorted
  * file confines a 1 % slice to ~1 % of rows, a shuffled file reads
  * everything. But a linear sort spends ALL its clustering on one
  * column — a 100 TB events table sorted by ts answers ts slices with
  * ts-sized scans and answers "device_id = X" with full scans. The
  * Z-curve splits the keyspace across every participating column at
  * every bit level, so each row group covers a narrow band of EACH
  * column; any single-column or conjunctive range predicate then
  * excludes most row groups via ordinary parquet min/max stats. The
  * reader needs nothing — this is purely an ingest-shape choice, like
  * Container's sortWithinPartitions and ShardExport's within-shard
  * order. ZOrderSpec measures the read-fraction table (linear layout:
  * one good column, one 100 % column; Z-order: both bounded).
  *
  * The bucket boundaries come from one `approxQuantile` pass — a
  * bounded driver collect (buckets−1 doubles per column, same class as
  * the k-means centroid fits), fitted on a sample-sized frame if the
  * caller prefers. Equi-depth bucketing makes the interleave
  * skew-robust: a heavy value occupies many buckets' worth of rows but
  * only one bucket id, and every other column still splits those rows.
  */
object Layout {

  /** Fit per-column equi-depth cut points (the buckets−1 internal
    * boundaries) in ONE approxQuantile pass over `df`. `relErr` trades
    * fit precision for pass cost; boundary precision only shifts rows
    * between adjacent buckets — pruning degrades gracefully, never
    * breaks. Columns must be numeric (cast timestamps to epoch first). */
  def cutPoints(df: DataFrame, cols: Seq[String], buckets: Int,
                relErr: Double = 0.001): Map[String, Array[Double]] = {
    require(buckets >= 2, s"need at least 2 buckets, got $buckets")
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val casted = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
    // one pass for all columns; approxQuantile state is mergeable and
    // bounded by 1/relErr per column
    val all = casted.stat.approxQuantile(cols.toArray, probs, relErr)
    cols.zip(all.map(_.distinct.sorted)).toMap
  }

  /** The Z-order key column for `(value, cuts)` pairs — see
    * [[graft.functions.ZOrderKey]]. Requires graft function
    * registration ([[graft.plans.GraftExtensions.register]]). */
  def zorderKey(dims: Seq[(Column, Array[Double])]): Column =
    call_function("graft_zorder",
      dims.flatMap { case (c, cuts) =>
        Seq(c.cast("double"), lit(cuts))
      }: _*)

  /** Cluster `df` for writing: range-partition on the Z-key (so file
    * boundaries follow the curve — each output FILE also gets a narrow
    * key range, which is what directory-less file skipping via footer
    * stats needs), then sort within partitions (so each ROW GROUP gets
    * one). `numFiles` sizes the output for the target filesystem
    * (100 TB rule of thumb: aim for ~1 GB files, not partition-count
    * defaults). The key column is dropped — it is derivable and the
    * stats live on the real columns. */
  def zorderWrite(df: DataFrame, dims: Seq[(Column, Array[Double])],
                  numFiles: Int, path: String,
                  options: Map[String, String] = Map.empty): Unit = {
    val key = zorderKey(dims)
    val clustered = df
      .withColumn("__zkey", key)
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
    val writer = options.foldLeft(clustered.write) {
      case (w, (k, v)) => w.option(k, v)
    }
    writer.parquet(path)
  }

  /** Small-files compaction — the maintenance half of incremental
    * ingest: streaming sinks and per-batch appends leave a directory of
    * KB-to-MB files whose per-file open/footer/seek overhead (and
    * driver listing cost) eventually dominates scans. Rewrite it into
    * `ceil(totalBytes / targetFileBytes)` files:
    *
    *   - `sortCols` empty → `coalesce`: NO shuffle — adjacent input
    *     splits merge in place. Cheapest, preserves only coarse input
    *     order; the right default when the input was never clustered.
    *   - `sortCols` given → `repartitionByRange` + sortWithinPartitions:
    *     one shuffle that re-establishes clustering while compacting,
    *     so the row-group stats layer (RowGroupPruningSpec) comes back
    *     with the rewrite. Use for time-series dirs whose append order
    *     drifted from ts order.
    *
    * Sizing reads the SOURCE directory's byte size from the filesystem
    * (a driver-side listing — the same cost any maintenance job pays;
    * compression ratio carries over since input and output are both
    * parquet). Writes to a NEW directory: swapping it in atomically is
    * the caller's move (rename), matching every table format's
    * compact-then-commit shape. Returns (inputFiles, outputFiles). */
  def compact(df: DataFrame, inputPath: String, outputPath: String,
              targetFileBytes: Long = 1L << 30,
              sortCols: Seq[Column] = Nil,
              options: Map[String, String] = Map.empty): (Int, Int) = {
    require(targetFileBytes > 0)
    val spark = df.sparkSession
    val fs = new org.apache.hadoop.fs.Path(inputPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(inputPath))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
    val totalBytes = files.map(_.getLen).sum
    val numFiles = math.max(1, math.ceil(
      totalBytes.toDouble / targetFileBytes).toInt)
    val compacted =
      if (sortCols.isEmpty) df.coalesce(numFiles)
      else df.repartitionByRange(numFiles, sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
    options.foldLeft(compacted.write) { case (w, (k, v)) => w.option(k, v) }
      .parquet(outputPath)
    val out = fs.listStatus(new org.apache.hadoop.fs.Path(outputPath))
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    (files.length, out)
  }
}
