package graft

import org.apache.spark.sql.functions._

/** Exact-boundary fixtures for the integer-arithmetic rewrites (the
  * q04 layout-gate class, SCALE.md r17): rows crafted so the TRUE
  * aggregate sits exactly ON a threshold or rounding half-boundary —
  * the inputs where a float-sum form's answer depends on summation
  * order. The integer forms must (a) decide strict inequalities
  * exactly (boundary value excluded by `>`), and (b) give identical
  * rows at different shuffle fan-outs even on boundary data.
  */
class BoundarySpec extends SparkSpec {
  import spark.implicits._

  /** events.parquet fixture from (event_id, ts, user_id, event_type,
    * value) rows, NTZ timestamps like the driver's layout. */
  private def eventsDir(rows: Seq[(Long, String, Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_boundary").toString
    rows.toDF("event_id", "tss", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp_ntz($"tss"))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q39: an hourly mean of EXACTLY 5.00 is not an active hour") {
    // user 1, hour A: values (4.99, 5.01, 3.30, 6.70) → mean 5.000
    //   exactly — `> 5.0` must exclude it (and the decision must not
    //   depend on which partial sum the float path would have taken:
    //   4.99+5.01 is representable noise either side of 10.0)
    // user 1, hour B: values (5.00, 5.02) → mean 5.01 → active
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 00:00:01", 1L, "click", 4.99),
      (2L, "2024-01-01 00:10:00", 1L, "click", 5.01),
      (3L, "2024-01-01 00:20:00", 1L, "click", 3.30),
      (4L, "2024-01-01 00:30:00", 1L, "click", 6.70),
      (5L, "2024-01-01 01:00:00", 1L, "click", 5.00),
      (6L, "2024-01-01 01:30:00", 1L, "click", 5.02)))
    val row = SparkEntry.queries("q39_insights")(spark, dir)
      .select($"user_id", $"active_hours").collect().head
    assert(row.getLong(1) == 1L,
      s"exact-5.00 hour must NOT count as active: got ${row.getLong(1)}")
  }

  test("q47: a daily total of EXACTLY 40000.00 is not an active device") {
    // type 'click': 40,000.00 exactly from awkward cent summands
    //   (16×2499.99 + 0.16 — float partial sums straddle the boundary)
    // type 'view': 40,000.01 → active
    val clickRows = (1 to 16).map(i =>
      (i.toLong, f"2024-01-01 ${i % 24}%02d:00:00", 1L, "click", 2499.99)) :+
      (17L, "2024-01-01 23:00:00", 1L, "click", 0.16)
    val viewRows = Seq(
      (18L, "2024-01-01 06:00:00", 1L, "view", 39999.02),
      (19L, "2024-01-01 07:00:00", 1L, "view", 0.99))
    val dir = eventsDir(clickRows ++ viewRows)
    val row = SparkEntry.queries("q47_active_devices")(spark, dir)
      .select($"active_devices", $"total_power").collect().head
    assert(row.getLong(0) == 1L,
      s"exact-40000.00 daily total must NOT be active: got ${row.getLong(0)}")
    assert(row.getDouble(1) == 80000.01, s"total_power ${row.getDouble(1)}")
  }

  test("q01: boundary-grid bucket means are identical at any fan-out") {
    // means that land exactly on 6dp half-boundaries in the rational
    // (x.0000005-class values cannot arise from /100-grid inputs with
    // these counts, but x.005/2 ties can at 2 rows) — the integer form
    // must emit the same bytes at shuffle partitions 2 and 7
    val rows = (1 to 64).map { i =>
      (i.toLong, f"2024-01-01 ${i % 8}%02d:${i % 60}%02d:00", (i % 4).toLong,
        "click", (i * 0.01) + (if (i % 2 == 0) 0.005 else 0.0))
    }
    val dir = eventsDir(rows.map(r => (r._1, r._2, r._3, r._4,
      math.rint(r._5 * 100) / 100))) // snap fixture to the cents grid
    def run(parts: Int): Seq[String] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try SparkEntry.queries("q01_resample_avg")(spark, dir)
        .collect().map(_.toString).toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", 2)
    }
    assert(run(2) == run(7))
  }

  test("driver testdata sits on the hundredths grid (fixed-point precondition)") {
    // The integer-cents rewrites (q01/q03/q04/q15/q17/q39/q40/q47/q101)
    // replace sum(value) with sum(round(value*100)::long)/100 on BOTH
    // the engine and the oracle side — so the oracle gate no longer
    // independently checks the raw float sum. That is only sound while
    // every monetary input is EXACTLY the double representation of an
    // integer number of cents. This guard reds out if a future testdata
    // generation drifts off the grid (sub-cent values), instead of the
    // pack silently redefining those metrics as cent-rounded aggregates.
    val cols = Seq(
      "events.parquet"   -> Seq("value"),
      "customer.parquet" -> Seq("c_acctbal"),
      "lineitem.parquet" -> Seq("l_extendedprice", "l_discount"),
      "part.parquet"     -> Seq("p_retailprice"), // q180's divisor
      "orders.parquet"   -> Seq("o_totalprice"))
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1");
         (table, cs) <- cols; c <- cs) {
      val df = spark.read.parquet(s"/root/testdata/$sf/$table")
      val row = df.agg(
        // value must round-trip through integer cents bit-exactly…
        max(abs(col(c) -
          round(col(c) * 100).cast("long").cast("double") / 100)).as("rt"),
        // …and the pre-round product must sit within double-noise of
        // the integer (an ambiguous 0.5-distance product would mean the
        // chosen cent is arbitrary)
        max(abs(col(c) * 100 - round(col(c) * 100))).as("noise")).collect().head
      assert(row.getDouble(0) == 0.0,
        s"$sf/$table.$c off the cents grid: round-trip err ${row.getDouble(0)}")
      assert(row.getDouble(1) < 1e-6,
        s"$sf/$table.$c ambiguous cents product: noise ${row.getDouble(1)}")
    }
    // q180 additionally rounds l_quantity to a whole number (its
    // per-unit divisor): quantities must sit exactly on the INTEGER
    // grid, and be strictly positive (a zero quantity would divide
    // by zero in the dev_bp form — ANSI would make that loud, but
    // red out here with the reason instead)
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val df = spark.read.parquet(s"/root/testdata/$sf/lineitem.parquet")
      val row = df.agg(
        max(abs(col("l_quantity") - round(col("l_quantity")))).as("err"),
        min(col("l_quantity")).as("mn")).collect().head
      assert(row.getDouble(0) == 0.0,
        s"$sf l_quantity off the integer grid: ${row.getDouble(0)}")
      assert(row.getDouble(1) >= 1.0,
        s"$sf l_quantity not strictly positive: ${row.getDouble(1)}")
    }
  }
}
