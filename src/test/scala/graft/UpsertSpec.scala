package graft

import graft.operators.Upsert
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot merge (SCD-1 upsert + deletes): semantics against a
  * window-form oracle, the duplicate-key/version contract, and the
  * plan shape that makes it the 100 TB form (ONE key shuffle, no
  * window sort — the same aggregate-algebra skew safety as the line
  * dedup struct-min). */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
    (4L, "d", 40.0), (5L, "e", 50.0)
  ).toDF("k", "name", "v").repartition(2)

  test("update, delete, insert, carry-over — all four paths") {
    val changes = Seq(
      (2L, "b2", 21.0, false), // update
      (3L, "c", 30.0, true),   // delete
      (6L, "f", 60.0, false)   // insert
    ).toDF("k", "name", "v", "_del")
    val out = Upsert.merge(base, changes, Seq("k"), deleteCol = Some("_del"))
      .orderBy($"k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      (1L, "a", 10.0), (2L, "b2", 21.0), (4L, "d", 40.0),
      (5L, "e", 50.0), (6L, "f", 60.0)))
  }

  test("duplicate keys in changes: highest orderCol wins") {
    val changes = Seq(
      (2L, "v1", 1.0, false, 1L),
      (2L, "v3", 3.0, false, 3L), // winner
      (2L, "v2", 2.0, false, 2L),
      (5L, "del-late", 0.0, true, 9L), // delete wins over...
      (5L, "upd-early", 5.5, false, 1L)
    ).toDF("k", "name", "v", "_del", "ver")
    val out = Upsert.merge(base, changes, Seq("k"),
        deleteCol = Some("_del"), orderCol = $"ver")
      .orderBy($"k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "a"), (2L, "v3"), (3L, "c"), (4L, "d")))
  }

  test("property: merge equals the window formulation on random data") {
    val n = 20000L
    val b = spark.range(n).select($"id".as("k"),
      concat(lit("base"), $"id").as("name"),
      ($"id" * 1.5).as("v"))
    // ~30 % updated (some keys twice with versions), ~5 % deleted,
    // 10 % inserted beyond the base key space
    val upd = spark.range(n * 2).filter(pmod($"id", lit(3)) === 0)
      .select(pmod($"id", lit(n)).as("k"),
        concat(lit("upd"), $"id").as("name"),
        ($"id" * 2.0).as("v"),
        (pmod($"id", lit(20)) === 0).as("_del"),
        ($"id" % 7).as("ver"))
    val ins = spark.range(n / 10)
      .select(($"id" + n * 10).as("k"),
        concat(lit("new"), $"id").as("name"),
        ($"id" * 3.0).as("v"), lit(false).as("_del"), lit(0L).as("ver"))
    val changes = upd.unionByName(ins)

    val got = Upsert.merge(b, changes, Seq("k"),
      deleteCol = Some("_del"), orderCol = $"ver")

    // independent window oracle: union tagged, rank by (src, ver) desc
    val tagged = b.withColumn("_del", lit(false))
      .withColumn("src", lit(0)).withColumn("ver", lit(0L))
      .unionByName(changes.withColumn("src", lit(1)))
    val oracle = tagged.withColumn("rn", row_number().over(
        Window.partitionBy($"k").orderBy($"src".desc, $"ver".desc,
          // deterministic tie-break only where (src, ver) ties exist —
          // max_by ties are unspecified, so break on the same payload
          $"name".desc)))
      .filter($"rn" === 1 && !$"_del")
      .select($"k", $"name", $"v")

    // ver = id % 7 can tie for the same k, and max_by ties are
    // unspecified — so key sets must match exactly, and payloads must
    // match on every key whose (src, ver) winner is unique
    val gotKeys = got.select($"k").as[Long].collect().sorted
    val oraKeys = oracle.select($"k").as[Long].collect().sorted
    assert(gotKeys.toSeq == oraKeys.toSeq)
    val gotRows = got.as[(Long, String, Double)].collect().map(t => t._1 -> t).toMap
    val oraRows = oracle.as[(Long, String, Double)].collect().map(t => t._1 -> t).toMap
    val tiedKeys = tagged
      .withColumn("mx", max(struct($"src", $"ver")).over(Window.partitionBy($"k")))
      .filter(struct($"src", $"ver") === $"mx")
      .groupBy($"k").agg(count(lit(1)).as("w"))
      .filter($"w" > 1).select($"k").as[Long].collect().toSet
    gotRows.foreach { case (k, t) =>
      if (!tiedKeys.contains(k)) assert(oraRows(k) == t, s"k=$k")
    }
    assert(tiedKeys.size < gotRows.size / 2, "fixture degenerated to all ties")
  }

  test("plan: ONE key shuffle, no window sort") {
    val changes = base.limit(2).withColumn("_del", lit(false))
    val q = Upsert.merge(base, changes, Seq("k"), deleteCol = Some("_del"))
    val p = q.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 hash exchange:\n$p")
    assert(!p.contains("Window"), s"window crept into the merge:\n$p")
    assert(p.contains("partial_max_by") || p.toLowerCase.contains("partial"),
      s"no map-side partial aggregation visible:\n$p")
  }
}
