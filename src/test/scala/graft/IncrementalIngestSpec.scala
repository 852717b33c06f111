package graft

import graft.streaming.IncrementalIngest
import org.apache.spark.sql.functions._

/** The exactly-once incremental contract, across three runs:
  *   run 1 processes batch-1 files; run 2 with NEW files processes ONLY
  *   those (no reprocessing of history — the property that makes a
  *   daily 100 TB pipeline a daily-sized job); run 3 with nothing new
  *   is a no-op. A transform rides the stream to show the ingest path
  *   is a real pipeline stage, not a copy.
  */
class IncrementalIngestSpec extends SparkSpec {
  import spark.implicits._

  test("AvailableNow runs drain only files that arrived since the checkpoint") {
    val base = java.nio.file.Files.createTempDirectory("graft_inc").toString
    val in = s"$base/landing"; val out = s"$base/out"; val cp = s"$base/cp"
    new java.io.File(in).mkdirs()

    def land(name: String, ids: Range): Unit =
      ids.map(i => (i.toLong, s"doc $i text")).toDF("doc_id", "text")
        .coalesce(1).write.parquet(s"$in/$name")
    def outIds(): Seq[Long] =
      spark.read.parquet(out).select("doc_id").as[Long].collect().sorted.toSeq

    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", "long").add("text", "string")
    val addLen = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("n_chars", length($"text").cast("long"))

    land("dump=001", 0 until 50)
    IncrementalIngest.runOnce(spark, in, out, cp, schema, addLen)
    assert(outIds() == (0L until 50L))
    // the transform ran on the way through
    assert(spark.read.parquet(out).filter($"n_chars" <= 0).isEmpty)

    land("dump=002", 50 until 80)
    IncrementalIngest.runOnce(spark, in, out, cp, schema, addLen)
    assert(outIds() == (0L until 80L),
      "second run must append exactly the new files' rows, once")

    // nothing new: a no-op run, not a reprocess
    IncrementalIngest.runOnce(spark, in, out, cp, schema, addLen)
    assert(outIds() == (0L until 80L))
  }

  test("crash between sink commit and checkpoint commit neither drops nor dups") {
    // The exactly-once claim's hard case (IncrementalIngest scaladoc:
    // "exactly-once across crashes comes from the two logs"): the sink's
    // _spark_metadata commit for batch N is durable but the process dies
    // BEFORE the checkpoint's commits/N marker lands. On restart,
    // streaming finds offsets/N without commits/N, re-executes batch N
    // from the logged offsets, and the file sink must DEDUPE (skip the
    // already-committed batch id) rather than append the rows twice.
    val base = java.nio.file.Files.createTempDirectory("graft_inc_crash").toString
    val in = s"$base/landing"; val out = s"$base/out"; val cp = s"$base/cp"
    new java.io.File(in).mkdirs()

    def land(name: String, ids: Range): Unit =
      ids.map(i => (i.toLong, s"doc $i text")).toDF("doc_id", "text")
        .coalesce(1).write.parquet(s"$in/$name")
    def outIds(): Seq[Long] =
      spark.read.parquet(out).select("doc_id").as[Long].collect().sorted.toSeq

    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", "long").add("text", "string")

    land("dump=001", 0 until 50)
    IncrementalIngest.runOnce(spark, in, out, cp, schema)
    land("dump=002", 50 until 80)
    IncrementalIngest.runOnce(spark, in, out, cp, schema)
    assert(outIds() == (0L until 80L))

    // surgically recreate the crash-window state: batch 1 executed, sink
    // log has it, checkpoint commit marker gone
    val commit1 = new java.io.File(s"$cp/commits/1")
    assert(commit1.exists, "precondition: checkpoint commit marker for batch 1")
    assert(new java.io.File(s"$out/_spark_metadata/1").exists,
      "precondition: sink commit log entry for batch 1")
    assert(commit1.delete(), "failed to remove the commit marker")
    // also drop Hadoop's checksum shadow — a real crash never wrote
    // either file; an orphaned .crc would make the recovery rewrite fail
    // with a spurious FileAlreadyExists (checksum mismatch), not the
    // scenario under test
    new java.io.File(s"$cp/commits/.1.crc").delete()

    // recovery run: re-executes batch 1 from offsets/1, sink must skip
    IncrementalIngest.runOnce(spark, in, out, cp, schema)
    assert(outIds() == (0L until 80L),
      "recovery duplicated or dropped batch-1 rows")
    assert(new java.io.File(s"$cp/commits/1").exists,
      "recovery must re-land the checkpoint commit marker")

    // and the pipeline keeps its incremental contract afterwards
    land("dump=003", 80 until 100)
    IncrementalIngest.runOnce(spark, in, out, cp, schema)
    assert(outIds() == (0L until 100L))
  }
}
