package graft.sources

import graft.nilm.{Labels, NilmDataset}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S2/S5/P1/P10/F3/F4: REFIT wide CSVs — `CLEAN_HouseN.csv` with
  * `Unix, Time, Issues, Aggregate, Appliance1..9` columns; `Time` and
  * `Issues` dropped, every remaining column is a channel whose id is
  * its 1-based position (`REFITLoader.py:36-116`).
  *
  * Houses have independent column sets, so files are enumerated
  * driver-side (house count is tiny) and each house's frame is
  * unpivoted to the narrow layout with the built-in `unpivot` — the
  * wide→narrow `stack` is executor-side; nothing per-row runs on the
  * driver. Metadata joins broadcast; rates are the median positive
  * delta of the house's shared index (`REFITLoader.py:83-89`).
  */
object RefitSource {

  /** Appliance metadata (`refit_appliance_metadata.json`, same shape as
    * UK-DALE's: `{"House N": [{channel, appliance_raw_label, ...}]}`). */
  def metadata(spark: SparkSession, path: String): DataFrame = {
    val meta = spark.read.option("multiLine", value = true)
      .json(s"$path/refit_appliance_metadata.json")
    val houses = meta.schema.fieldNames.filter(_.startsWith("House "))
    houses.map { hk =>
      val hid = hk.stripPrefix("House ").trim.toInt
      meta.select(explode(col(s"`$hk`")).as("e"))
        .select(
          lit(hid).as("house_id"),
          col("e.channel").cast("int").as("channel_n"),
          col("e.appliance_raw_label").as("raw_label_meta"),
          col("e.manufacturer").as("manufacturer"),
          col("e.model").as("model"))
    }.reduce(_ unionByName _)
  }

  private def listHouseFiles(spark: SparkSession, path: String): Seq[(Int, String)] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq
      .map(_.getPath)
      .filter { f =>
        f.getName.startsWith("CLEAN_House") && f.getName.endsWith(".csv")
      }
      .sortBy(_.getName) // deterministic ingest order (O6)
      .map(f => (f.getName.stripPrefix("CLEAN_House").stripSuffix(".csv").toInt,
        f.toString))
  }

  /** One house: wide csv → narrow (house_id, channel_n, col_name, ts, power). */
  def loadHouse(spark: SparkSession, houseId: Int, file: String): DataFrame = {
    val wide0 = spark.read.option("header", value = true).csv(file)
    val wide = wide0.drop("Time", "Issues") // P1
    val chanCols = wide.columns.filter(_ != "Unix")
    val narrow = wide
      .withColumn("ts", timestamp_seconds(col("Unix").cast("long")))
      .unpivot(
        Array(col("ts")),
        chanCols.map(c => col(s"`$c`").cast("double").as(c)),
        "col_name", "power")
    val pos = chanCols.zipWithIndex.map { case (c, i) => c -> (i + 1) }.toMap
    narrow
      .withColumn("house_id", lit(houseId.toLong))
      .withColumn("channel_n", element_at(typedlit(pos), col("col_name")))
  }

  def load(spark: SparkSession, path: String): NilmDataset = {
    val perHouse = listHouseFiles(spark, path)
      .map { case (hid, f) => loadHouse(spark, hid, f) }
    require(perHouse.nonEmpty, s"no CLEAN_House*.csv under $path")
    val narrow = perHouse.reduce(_ unionByName _)

    val readings = narrow.select(
      lit("refit").as("dataset"),
      col("house_id"),
      concat(lit("channel_"), col("channel_n")).as("channel_id"),
      col("ts"),
      col("power"))

    // shared house index → per-house rate (REFITLoader.py:83-89); the
    // reference falls back to "8S" when no positive delta exists
    val houseRates = Rates.inferPerKey(
        narrow.select(col("house_id"), col("ts")).distinct(),
        Seq(col("house_id")), col("ts"))
      .withColumn("rate_s", coalesce(col("rate_s"), lit(8L)))

    val meta = metadata(spark, path)
    val channels = narrow
      .select("house_id", "channel_n", "col_name").distinct()
      .join(broadcast(meta), Seq("house_id", "channel_n"), "left")
      .join(broadcast(houseRates.select("house_id", "rate_s")), Seq("house_id"))
      // raw label: "aggregate" for Aggregate* columns, else metadata,
      // else the trimmed column name (REFITLoader.py:68-75)
      .withColumn("raw_label",
        when(lower(col("col_name")).startsWith("aggregate"), "aggregate")
          .otherwise(coalesce(col("raw_label_meta"), trim(col("col_name")))))
      .select(
        lit("refit").as("dataset"),
        col("house_id"),
        concat(lit("channel_"), col("channel_n")).as("channel_id"),
        col("raw_label"),
        Labels.universalLabel(col("raw_label")).as("universal_label"),
        lit("watts").as("unit"),
        lit("active").as("data_type"),
        col("rate_s").as("sample_rate_s"),
        coalesce(col("manufacturer"), lit("")).as("manufacturer"),
        coalesce(col("model"), lit("")).as("model"),
        lit("IAM").as("acquisition_device"))

    NilmDataset(readings, channels)
  }
}
