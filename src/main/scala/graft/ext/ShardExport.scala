package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data export: deterministic global shuffle + fixed shard
  * assignment (builder brief: operations a large-scale training
  * pipeline needs). A trainer reading shard files in order must see a
  * pseudo-random document order that is NOT correlated with source,
  * time, or ingest order — and the same order on every rerun.
  *
  * Both the shard id and the within-shard order are pure functions of
  * (salt, id) — md5-derived like [[Sampling.hashBucket]], never
  * `rand()` — so the export is reproducible across runs and engines,
  * stable under repartitioning and task retries, and auditable by an
  * oracle.
  *
  * Scale notes: assignment is per-row map work (no shuffle); the write
  * shuffles once on shard_id and sorts within partitions — Spark's sort
  * spills, so a shard larger than executor memory still writes. Shard
  * sizes are hash-balanced (±O(√n) of n/nShards). For equal-count
  * shards one would ntile over a global sort instead — a full-data
  * range exchange that is rarely worth it for training shards.
  */
object ShardExport {

  /** Deterministic shard id in [0, nShards): 28-bit md5 hash of
    * (salt, id), mod the shard count. */
  def shardId(id: Column, nShards: Int, salt: String): Column =
    pmod(conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 7), 16, 10)
      .cast("long"), lit(nShards.toLong))

  /** 60-bit order key for the within-shard pseudo-random shuffle
    * (distinct salt domain from [[shardId]] so shard and order are
    * independent hashes of the same id). */
  def shuffleKey(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), lit("#ord:"), id.cast("string"))), 1, 15),
      16, 10).cast("long")

  /** Adds `shard_id` and `shuffle_key` columns. */
  def assignShards(df: DataFrame, id: Column, nShards: Int,
                   salt: String): DataFrame = {
    require(nShards > 0, s"nShards $nShards")
    df.withColumn("shard_id", shardId(id, nShards, salt))
      .withColumn("shuffle_key", shuffleKey(id, salt))
  }

  /** Writes `outDir/shard_id=K/` with ONE parquet file per shard, rows
    * in the deterministic shuffled order: repartition on shard_id puts
    * each shard in a single task, the within-partition sort fixes the
    * row order, and the partitioned writer splits any task that holds
    * several (hash-colliding) shards into one file per directory. */
  def writeShards(df: DataFrame, id: Column, nShards: Int, salt: String,
                  outDir: String): Unit =
    assignShards(df, id, nShards, salt)
      .repartition(nShards, col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("shuffle_key"), id)
      .write.mode("overwrite").partitionBy("shard_id").parquet(outDir)
}
