package graft

import graft.operators.{SnapshotDiff, Upsert}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SnapshotDiff (operators/SnapshotDiff.scala): classification
  * cross-checked on random snapshots against independent anti-join /
  * except routes, the merge(old, diff) = new roundtrip (diff is
  * Upsert's inverse), null-safe change detection, and the bucketed
  * zero-exchange plan pin (two snapshots written `bucketBy(key)` diff
  * without any ShuffleExchange — the 100 TB daily-diff lever). */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def randomSnaps(seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val oldRows = (0 until 500).filter(_ => rnd.nextDouble() < 0.9)
      .map(k => (k.toLong, rnd.nextInt(100).toDouble, s"s${rnd.nextInt(3)}"))
    val newRows = (0 until 500).filter(_ => rnd.nextDouble() < 0.9)
      .map(k => (k.toLong,
        if (rnd.nextDouble() < 0.3) rnd.nextInt(100).toDouble + 1000 else
          oldRows.find(_._1 == k).map(_._2).getOrElse(rnd.nextInt(100).toDouble),
        s"s${rnd.nextInt(3)}"))
    (oldRows.toDF("k", "v", "tag"), newRows.toDF("k", "v", "tag"))
  }

  test("classification agrees with independent except/anti-join routes") {
    val (o, n) = randomSnaps(42)
    val d = SnapshotDiff.diff(o, n, Seq("k"), Seq("v", "tag"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2))).toMap
    val oldKeys = o.select("k").as[Long].collect().toSet
    val newKeys = n.select("k").as[Long].collect().toSet
    val inserts = newKeys -- oldKeys
    val deletes = oldKeys -- newKeys
    val oldMap = o.as[(Long, Double, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val newMap = n.as[(Long, Double, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val updates = (oldKeys & newKeys).filter(k => oldMap(k) != newMap(k))
    assert(d.keySet == inserts ++ deletes ++ updates)
    inserts.foreach(k => assert(d(k)._1 == "insert"))
    deletes.foreach(k => assert(d(k)._1 == "delete"))
    updates.foreach { k =>
      assert(d(k)._1 == "update")
      val expect = Seq("v" -> (oldMap(k)._1 != newMap(k)._1),
        "tag" -> (oldMap(k)._2 != newMap(k)._2))
        .collect { case (c, true) => c }.mkString(",")
      assert(d(k)._2 == expect, s"changed_cols key $k")
    }
  }

  test("merge(old, diff) reproduces the new snapshot (Upsert inverse)") {
    val (o, n) = randomSnaps(7)
    val d = SnapshotDiff.diff(o, n, Seq("k"), Seq("v", "tag"))
    val changes = d.select($"k", $"new_v".as("v"), $"new_tag".as("tag"),
      ($"change_type" === "delete").as("is_del"))
    val merged = Upsert.merge(o, changes, Seq("k"),
      deleteCol = Some("is_del"))
    assert(merged.exceptAll(n).count() == 0 && n.exceptAll(merged).count() == 0,
      "merge(old, diff(old,new)) must equal new")
  }

  test("null transitions are changes; null==null is not") {
    val o = Seq((1L, Option(1.0)), (2L, Option.empty[Double]),
      (3L, Option.empty[Double])).toDF("k", "v")
    val n = Seq((1L, Option.empty[Double]), (2L, Option(2.0)),
      (3L, Option.empty[Double])).toDF("k", "v")
    val d = SnapshotDiff.diff(o, n, Seq("k"), Seq("v"))
      .select($"k", $"change_type").as[(Long, String)].collect().toMap
    assert(d == Map(1L -> "update", 2L -> "update"),
      "value↔null are updates; null↔null is unchanged")
  }

  test("includeUnchanged keeps carry-over rows with empty changed_cols") {
    val o = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    val n = Seq((1L, 1.0), (2L, 9.0)).toDF("k", "v")
    val byKey = SnapshotDiff.diff(o, n, Seq("k"), Seq("v"),
        includeUnchanged = true)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    assert(byKey(1L) == ("unchanged", ""))
    assert(byKey(2L) == ("update", "v"))
  }

  test("bucketed snapshots diff with ZERO shuffle exchanges") {
    val o = (0L until 2000L).map(k => (k, k * 1.5)).toDF("k", "v")
    val n = (10L until 2010L).map(k => (k, if (k % 7 == 0) -1.0 else k * 1.5))
      .toDF("k", "v")
    o.write.mode("overwrite").bucketBy(4, "k")
      .saveAsTable("graft_snap_old")
    n.write.mode("overwrite").bucketBy(4, "k")
      .saveAsTable("graft_snap_new")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val d = SnapshotDiff.diff(spark.table("graft_snap_old"),
        spark.table("graft_snap_new"), Seq("k"), Seq("v"))
      val plan = d.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed diff must not shuffle:\n$plan")
      // and it still computes the right thing
      val got = d.select($"k", $"change_type").as[(Long, String)]
        .collect().toMap
      assert((0L until 10L).forall(got(_) == "delete"))
      assert((2000L until 2010L).forall(got(_) == "insert"))
      assert(got.count(_._2 == "update") ==
        (10L until 2000L).count(_ % 7 == 0))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_snap_old")
      spark.sql("DROP TABLE IF EXISTS graft_snap_new")
    }
  }
}
