package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** Third layer of the 100 TB scan story. PartitionPruningSpec proves
  * STATIC directory pruning (a literal ts slice), RowGroupPruningSpec
  * proves min/max stats inside a file — this spec proves DYNAMIC
  * partition pruning: a star join where the selective predicate lives
  * on the DIMENSION side, so no literal fact filter exists at plan
  * time. Catalyst must inject a runtime subquery filter (the dim's
  * broadcast result) into the fact scan's PartitionFilters, or the
  * fact side reads all partitions and the join discards 93 % of them
  * after the fact — at 100 TB, the difference between scanning 2 days
  * and scanning the table because the filter "was on the other table".
  */
class DynamicPruningSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // fact: driver events partitioned by event_date (one file per
  // directory); dim: its distinct dates + a day-of-month attribute,
  // written as a SEPARATE parquet so the probe is a genuine dim filter
  private lazy val (factDir, dimDir, nDates) = {
    assume(new java.io.File(s"$sf/events.parquet").exists(),
      s"driver testdata absent at $sf")
    val base = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val ev = Tables.events(spark, sf)
      .withColumn("event_date", to_date(col("ts")))
    ev.repartition(col("event_date"))
      .write.partitionBy("event_date").parquet(s"$base/events.parquet")
    ev.select($"event_date").distinct()
      .withColumn("dom", dayofmonth($"event_date"))
      .coalesce(1).write.parquet(s"$base/dates.parquet")
    val n = new java.io.File(s"$base/events.parquet").listFiles()
      .count(_.getName.startsWith("event_date="))
    (s"$base/events.parquet", s"$base/dates.parquet", n)
  }

  // AQE wraps the join in an AdaptiveSparkPlanExec whose collectLeaves
  // stops at the adaptive node — recurse into its current inner plan
  private def factScan(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    def leaves(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        leaves(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        leaves(s.plan)
      case other => other.collectLeaves().flatMap {
        case l if l eq other => Seq(l) // a genuine leaf — stop
        case l => leaves(l)
      }
    }
    leaves(df.queryExecution.executedPlan)
      .collectFirst {
        case f: FileSourceScanExec if f.toString.contains("events.parquet") => f
      }.getOrElse(fail("no fact FileSourceScanExec in\n" +
        df.queryExecution.executedPlan))
  }

  test("star join: dim-side filter prunes fact partitions at runtime") {
    val fact = spark.read.parquet(factDir)
    val dim = spark.read.parquet(dimDir).filter($"dom".isin(10, 11))
    val q = fact.join(dim, Seq("event_date"))
      .groupBy($"event_date").agg(count(lit(1)).as("n"))

    // the runtime filter must be a PARTITION filter on the fact scan
    val scanBefore = factScan(q)
    assert(scanBefore.toString.contains("dynamicpruning"),
      s"no dynamic pruning subquery in fact scan:\n$scanBefore")

    val rows = q.collect()
    assert(rows.nonEmpty && rows.length <= 2, rows.mkString(","))
    val filesRead = factScan(q).metrics("numFiles").value
    assert(nDates > 10, s"fixture too small to prove pruning: $nDates")
    assert(filesRead == rows.length,
      s"dim filter selects ${rows.length} dates; fact scan read $filesRead " +
        s"of $nDates partitions — DPP not engaging")
  }

  test("without a dim filter the fact scan reads every partition") {
    val fact = spark.read.parquet(factDir)
    val dim = spark.read.parquet(dimDir)
    val q = fact.join(dim, Seq("event_date"))
      .groupBy($"event_date").agg(count(lit(1)).as("n"))
    q.collect()
    assert(factScan(q).metrics("numFiles").value == nDates)
  }
}
