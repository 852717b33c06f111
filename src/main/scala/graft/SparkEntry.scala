package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (one entry per SURVEY.md §2
  * operator family, expressed over the driver's testdata tables);
  * `oracleSql` is the DuckDB-equivalent SQL for each (omitted only for
  * ops DuckDB cannot express → rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_resample_avg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.defs ++ TimeSeriesQueries.defs ++ DocumentQueries.defs ++
      NilmQueries.defs

  def oracleSql: Map[String, String] =
    (RelationalQueries.oracles ++ TimeSeriesQueries.oracles ++
      DocumentQueries.oracles ++ NilmQueries.oracles)
      .map { case (k, v) => k -> v.stripMargin.replaceAll("\\s+", " ").trim }
}
