package graft

import graft.ext.ShardExport
import org.apache.spark.sql.functions._

/** Deterministic shard assignment + one-file-per-shard export. */
class ShardExportSpec extends SparkSpec {

  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, s"doc $i")).toDF("id", "body")

  test("assignShards is a pure function of (salt, id)") {
    val a = ShardExport.assignShards(docs(200), $"id", 8, "s1")
      .select("id", "shard_id", "shuffle_key").collect().toSeq
    val b = ShardExport.assignShards(docs(200).repartition(7), $"id", 8, "s1")
      .select("id", "shard_id", "shuffle_key").collect().toSeq
    assert(a.toSet == b.toSet)
    val shards = a.map(_.getLong(1))
    assert(shards.forall(s => s >= 0 && s < 8))
    assert(shards.distinct.size == 8) // 200 ids hit every shard
    // a different salt reshuffles
    val c = ShardExport.assignShards(docs(200), $"id", 8, "s2")
      .select("id", "shard_id").collect().toSeq
    assert(a.map(r => r.getLong(0) -> r.getLong(1)).toMap !=
      c.map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  test("shard order is pseudo-random, not id order") {
    val rows = ShardExport.assignShards(docs(100), $"id", 1, "s1")
      .orderBy($"shuffle_key", $"id").select("id").as[Long].collect().toSeq
    assert(rows.sorted == (0L until 100L))
    assert(rows != rows.sorted) // hash order broke the ingest order
  }

  test("writeShards emits one file per shard dir in deterministic order") {
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    ShardExport.writeShards(docs(300), $"id", 4, "exp", out)
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard_id=")).sortBy(_.getName)
    assert(dirs.map(_.getName).toSeq ==
      (0 until 4).map(i => s"shard_id=$i"))
    dirs.foreach { dir =>
      assert(dir.listFiles().count(_.getName.endsWith(".parquet")) == 1)
    }
    // reading a shard back yields exactly that shard's rows, in the
    // assigned shuffle order (parquet preserves row order per file)
    val expect = ShardExport.assignShards(docs(300), $"id", 4, "exp")
      .filter($"shard_id" === 2)
      .orderBy($"shuffle_key", $"id").select("id").as[Long].collect().toSeq
    val got = spark.read.parquet(s"$out/shard_id=2").select("id")
      .as[Long].collect().toSeq
    assert(got == expect)
    // rerun → byte-identical row order
    ShardExport.writeShards(docs(300), $"id", 4, "exp", out)
    val again = spark.read.parquet(s"$out/shard_id=2").select("id")
      .as[Long].collect().toSeq
    assert(again == expect)
  }
}
