package graft

import graft.nilm.NilmDataset
import graft.sources.{Container, RefitSource, UkdaleSource}
import org.apache.spark.sql.SparkSession
import java.io.{BufferedWriter, FileWriter}
import java.nio.file.{Files, Path}

/** E2E ingest benchmark (round-2 verdict "Next round #10"): synthesizes
  * a ~10⁶-row UK-DALE + REFIT source tree on local disk, then times the
  * full pipeline the golden tests only exercise at toy size:
  *
  *   E1  raw tree → canonical NilmDataset (distributed scans, metadata
  *       broadcast joins, per-channel rate inference)
  *   S7  container write (partitioned parquet, float32 compaction)
  *   S8  container read
  *   E2  resample → compute-aggregate + common-channels over the
  *       container (the facade workload)
  *
  * Prints one JSON line with per-stage seconds. Row volume scales with
  * SPARK_GRAFT_INGEST_ROWS (total target, default 1,000,000).
  *
  * Generation is deterministic (seeded) and driver-side: the fixture
  * writer is not the system under test; ~25 MB of text writes in
  * seconds. */
object IngestBench {

  private def writeLines(p: Path)(f: BufferedWriter => Unit): Unit = {
    val w = new BufferedWriter(new FileWriter(p.toFile))
    try f(w) finally w.close()
  }

  /** UK-DALE tree: houses × channels `channel_N.dat` (ts power) + the
    * combined metadata JSON. Channel 1 is the metered aggregate. */
  def genUkdale(root: Path, houses: Int, channels: Int,
                rowsPerChannel: Int): Unit = {
    val rnd = new scala.util.Random(41)
    val labels = Seq("aggregate", "fridge freezer", "washing machine",
      "kettle", "television", "dish washer", "microwave", "toaster")
    for (h <- 1 to houses; c <- 1 to channels) {
      val dir = root.resolve(s"house_$h")
      Files.createDirectories(dir)
      val t0 = 1600000000L + h * 17
      writeLines(dir.resolve(s"channel_$c.dat")) { w =>
        var i = 0
        while (i < rowsPerChannel) {
          val ts = t0 + 6L * i
          val power = math.abs(rnd.nextGaussian()) * (if (c == 1) 400 else 60)
          w.write(s"$ts ${math.round(power * 100) / 100.0}\n")
          i += 1
        }
      }
    }
    val metaDir = root.resolve("metadata")
    Files.createDirectories(metaDir)
    val houseBlocks = (1 to houses).map { h =>
      val chans = (1 to channels).map { c =>
        val raw = if (c == 1) "aggregate" else labels(c % labels.size)
        s"""{"channel": $c, "appliance_raw_label": "$raw",
           |"manufacturer": "m$c", "model": "x$c",
           |"acquisition_device": "${if (c == 1) "EcoManagerWholeHouseTx" else "EcoManagerTxPlug"}"}"""
          .stripMargin.replaceAll("\n", " ")
      }.mkString("[", ", ", "]")
      s""""House $h": $chans"""
    }.mkString("{", ", ", "}")
    writeLines(metaDir.resolve("ukdale_combined_metadata.json"))(_.write(houseBlocks))
  }

  /** REFIT tree: `CLEAN_HouseN.csv` wide files + appliance metadata. */
  def genRefit(root: Path, houses: Int, appliances: Int,
               rowsPerHouse: Int): Unit = {
    val rnd = new scala.util.Random(43)
    Files.createDirectories(root)
    for (h <- 1 to houses) {
      writeLines(root.resolve(s"CLEAN_House$h.csv")) { w =>
        val appCols = (1 to appliances).map(i => s"Appliance$i").mkString(",")
        w.write(s"Unix,Time,Issues,Aggregate,$appCols\n")
        val t0 = 1600000000L + h * 31
        var i = 0
        while (i < rowsPerHouse) {
          val ts = t0 + 8L * i
          val agg = math.abs(rnd.nextGaussian()) * 500
          val apps = (1 to appliances)
            .map(_ => math.round(math.abs(rnd.nextGaussian()) * 80 * 100) / 100.0)
            .mkString(",")
          w.write(s"$ts,ignored,0,${math.round(agg * 100) / 100.0},$apps\n")
          i += 1
        }
      }
    }
    val houseBlocks = (1 to houses).map { h =>
      val chans = (1 to appliances + 1).map { c =>
        val raw = if (c == 1) "aggregate" else s"appliance type $c"
        s"""{"channel": $c, "appliance_raw_label": "$raw", "manufacturer": "m", "model": "x"}"""
      }.mkString("[", ", ", "]")
      s""""House $h": $chans"""
    }.mkString("{", ", ", "}")
    writeLines(root.resolve("refit_appliance_metadata.json"))(_.write(houseBlocks))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val totalTarget = sys.env.getOrElse("SPARK_GRAFT_INGEST_ROWS", "1000000").toLong
    // 3 houses × 5 channels UK-DALE carries 75% of rows; REFIT wide rows
    // fan out ×(appliances+1) readings each
    val ukHouses = 3; val ukChannels = 5
    val reHouses = 2; val reApps = 4
    val ukRows = (totalTarget * 3 / 4 / (ukHouses * ukChannels)).toInt
    val reRows = (totalTarget / 4 / (reHouses * (reApps + 1))).toInt

    val base = Files.createTempDirectory("graft_ingest")
    val t0 = System.nanoTime()
    genUkdale(base.resolve("ukdale"), ukHouses, ukChannels, ukRows)
    genRefit(base.resolve("refit"), reHouses, reApps, reRows)
    val tGen = (System.nanoTime() - t0) / 1e9

    def timed[A](f: => A): (A, Double) = {
      val s = System.nanoTime(); val a = f
      (a, (System.nanoTime() - s) / 1e9)
    }

    // E1: raw load → full materialization of readings + channels
    val ((ds, nRows), tLoad) = timed {
      val u = UkdaleSource.load(spark, base.resolve("ukdale").toString)
      val r = RefitSource.load(spark, base.resolve("refit").toString)
      val merged = u.union(r)
      val n = merged.readings.count()
      merged.channels.count()
      (merged, n)
    }
    // S7: container write
    val containerDir = base.resolve("container").toString
    val (_, tWrite) = timed(Container.write(ds, containerDir))
    // S8 + E2: read back, resample, facade queries
    val (_, tQuery) = timed {
      val c = Container.read(spark, containerDir)
      val resampled = c.resampleAllChannels(24)
      resampled.computeAggregateFromAppliances().count()
      c.commonChannels(Seq("aggregate", "washing machine")).count()
      Caching.release()
    }

    def f(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"metric":"ingest_e2e","value":${f(tLoad + tWrite + tQuery)},"unit":"sec","rows":$nRows,"stages":{"gen_fixture":${f(tGen)},"e1_raw_load":${f(tLoad)},"s7_container_write":${f(tWrite)},"s8_e2_query":${f(tQuery)}}}""")
    spark.stop()
  }
}
