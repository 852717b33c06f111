package graft

import org.apache.spark.sql.functions._

/** Third-route checks for the analytics pack: the DuckDB oracle proves
  * Spark and DuckDB agree; these tests recompute the same statistic in
  * PLAIN SCALA from the raw rows, so the math is independent of both
  * engines' SQL semantics (three routes agreeing). All run at sf0.001
  * (driver-collectable sizes). */
class AnalyticsSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val rawEvents: Seq[(Long, Long, String, Double)] =
    Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts").as("us"), $"event_type", $"value")
      .as[(Long, Long, String, Double)].collect().toSeq

  private val cutoffUs = 1705276800000000L // 2024-01-15 00:00:00 UTC in µs

  test("q124 slope equals a driver-side exact-integer OLS") {
    val got = q("q124_trend_slope")
      .select($"user_id", $"slope_per_day")
      .as[(Long, Double)].collect().toMap
    val epoch2024 = 1704067200L
    rawEvents.groupBy(_._1).foreach { case (uid, rows) =>
      val pts = rows.map { case (_, us, _, v) =>
        (us / 1000000L - epoch2024, math.floor(v * 10000 + 0.5).toLong)
      }
      val n = pts.size.toLong
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val slope = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
        (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble)
      val want = slope * 86400 / 10000
      assert(java.lang.Double.compare(got(uid), want) == 0,
        s"user $uid: ${got(uid)} vs $want") // bit-exact by design
    }
  }

  test("q125 KS equals a driver-side binned sup-CDF distance") {
    val got = q("q125_ks_drift")
      .select($"event_type", $"ks").as[(String, Double)].collect().toMap
    rawEvents.groupBy(_._3).foreach { case (et, rows) =>
      val vals = rows.map(r => (r._4, r._2 < cutoffUs))
      val mn = vals.map(_._1).min; val mx = vals.map(_._1).max
      def bin(v: Double) =
        if (mx == mn) 0
        else math.min(math.floor((v - mn) / ((mx - mn) / 100)).toInt, 99)
      val byBin = vals.groupBy(v => bin(v._1)).toSeq.sortBy(_._1)
      val nb = vals.count(_._2).toLong; val nc = vals.size - nb
      var cb = 0L; var cc = 0L; var num = 0L
      byBin.foreach { case (_, vs) =>
        cb += vs.count(_._2); cc += vs.count(!_._2)
        num = math.max(num, math.abs(cb * nc - cc * nb))
      }
      val want = num.toDouble / (nb * nc).toDouble
      assert(java.lang.Double.compare(got(et), want) == 0,
        s"$et: ${got(et)} vs $want")
    }
  }

  test("q125 emits NULL ks when all of a type's data is one side of the cutoff") {
    // Spark's 0/0 double is NaN while DuckDB's is NULL — the query must
    // decide the degenerate case BEFORE the division (explicit NULL) or
    // the oracle gate fails on any dataset with a one-sided event_type.
    val dir = java.nio.file.Files.createTempDirectory("q125degen").toString
    Seq(
      (1L, "2024-01-01 00:00:00", "only_base", 1.0),
      (2L, "2024-01-02 00:00:00", "only_base", 2.0),
      (3L, "2024-01-20 00:00:00", "only_current", 3.0),
      (4L, "2024-01-01 00:00:00", "both", 1.0),
      (5L, "2024-01-20 00:00:00", "both", 2.0))
      .toDF("event_id", "tss", "event_type", "value")
      .withColumn("ts", to_timestamp_ntz($"tss"))
      .withColumn("user_id", lit(1L)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q125_ks_drift")(spark, dir)
      .select($"event_type", $"ks").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out("only_base").isEmpty, "nb-only type must be NULL, not NaN")
    assert(out("only_current").isEmpty, "nc-only type must be NULL, not NaN")
    assert(out("both").exists(v => !v.isNaN), "two-sided type stays numeric")
  }

  test("q123 PSI equals a driver-side recomputation (1e-12)") {
    val got = q("q123_psi_drift")
      .select($"event_type", $"psi").as[(String, Double)].collect().toMap
    rawEvents.groupBy(_._3).foreach { case (et, rows) =>
      val base = rows.filter(_._2 < cutoffUs).map(_._4)
      val cur = rows.filterNot(_._2 < cutoffUs).map(_._4)
      val mn = base.min; val mx = base.max
      def bin(v: Double) =
        if (mx == mn) 0
        else math.max(math.min(
          math.floor((v - mn) / ((mx - mn) / 10)).toInt, 9), 0)
      val bins = (base.map(v => (bin(v), true)) ++
        cur.map(v => (bin(v), false))).groupBy(_._1)
      val nb = base.size.toLong; val nc = cur.size.toLong
      val psi = bins.values.map { vs =>
        val cb = vs.count(_._2); val cc = vs.size - cb
        val p = (cb + 1).toDouble / (nb + 10)
        val qq = (cc + 1).toDouble / (nc + 10)
        (qq - p) * math.log(qq / p)
      }.sum
      // rounded to 6 on the engine side; sum order differs here
      assert(math.abs(got(et) - psi) < 1e-6 + 1e-12,
        s"$et: ${got(et)} vs $psi")
    }
  }

  test("q130 CUPED equals a driver-side recomputation") {
    val got = q("q130_cuped")
      .select($"variant", $"mean_cuped", $"var_cuped")
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val per = rawEvents.groupBy(_._1).flatMap { case (uid, rows) =>
      val x = rows.filter(_._2 < cutoffUs)
        .map(r => math.floor(r._4 * 100 + 0.5).toLong).sum
      val y = rows.filterNot(_._2 < cutoffUs)
        .map(r => math.floor(r._4 * 100 + 0.5).toLong).sum
      val npre = rows.count(_._2 < cutoffUs)
      if (npre > 0 && npre < rows.size) Some((uid, x, y)) else None
    }.toSeq
    val n = per.size.toLong
    val sx = per.map(_._2).sum; val sy = per.map(_._3).sum
    val sxy = per.map(p => p._2 * p._3).sum
    val sxx = per.map(p => p._2 * p._2).sum
    val t = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
      (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble)
    val xb = sx.toDouble / n.toDouble
    per.groupBy(_._1 % 2).foreach { case (variant, vs) =>
      val adj = vs.map(v => v._3.toDouble - t * (v._2.toDouble - xb))
      val mean = adj.sum / adj.size / 100
      val varA = adj.map(a => a * a).sum / adj.size -
        (adj.sum / adj.size) * (adj.sum / adj.size)
      val (gm, gv) = got(variant)
      assert(math.abs(gm - mean) < 1e-9, s"mean v$variant: $gm vs $mean")
      assert(math.abs(gv - varA / 10000) < 1e-6,
        s"var v$variant: $gv vs ${varA / 10000}")
    }
  }

  test("q135 trimmed mean equals the sort-based brute force") {
    val got = q("q135_trimmed_mean")
      .select($"event_type", $"n_kept", $"trimmed_mean")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    rawEvents.groupBy(_._3).foreach { case (et, rows) =>
      val vs = rows.map(r => math.floor(r._4 * 100 + 0.5).toLong).sorted
      val k = vs.size / 10
      val trimmed = vs.slice(k, vs.size - k)
      val want = trimmed.sum.toDouble / trimmed.size.toDouble / 100
      val (gn, gm) = got(et)
      assert(gn == trimmed.size, s"$et n_kept: $gn vs ${trimmed.size}")
      assert(java.lang.Double.compare(gm, want) == 0,
        s"$et: $gm vs $want") // bit-exact by design
    }
  }

  test("q131 association rules equal a driver-side basket recomputation") {
    val got = q("q131_assoc_rules")
      .select($"a", $"b", $"cab", $"lift")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val baskets = rawEvents.groupBy(_._1).view
      .mapValues(_.map(_._3).distinct.toSet).toMap
    val nu = baskets.size.toLong
    val marg = baskets.values.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val pairs = baskets.values.toSeq.flatMap { ts =>
      val s = ts.toSeq.sorted
      for (i <- s.indices; j <- i + 1 until s.size) yield (s(i), s(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(pairs.nonEmpty && got.keySet == pairs.keySet)
    pairs.foreach { case (p, cab) =>
      val (gcab, glift) = got(p)
      assert(gcab == cab, s"$p: $gcab vs $cab")
      val want = cab.toDouble * nu.toDouble /
        (marg(p._1).toDouble * marg(p._2).toDouble)
      assert(java.lang.Double.compare(glift, want) == 0, s"lift $p")
    }
  }

  test("q107 retention equals a driver-side cohort recomputation") {
    val got = q("q107_cohort_retention")
      .select(unix_date($"cohort_week").as("cw"), $"week_offset", $"n_users")
      .as[(Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // Monday-truncated week in days since epoch: day 0 was a Thursday,
    // so Monday-alignment is (d + 3) - (d + 3) % 7 - 3
    def week(us: Long): Long = {
      val d = us / 86400000000L
      (d + 3) - (d + 3) % 7 - 3
    }
    val byUser = rawEvents.groupBy(_._1).view
      .mapValues(_.map(r => week(r._2)).distinct).toMap
    val want = byUser.toSeq.flatMap { case (_, wks) =>
      val cohort = wks.min
      wks.map(w => (cohort.toInt, (w - cohort) / 7))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(want.nonEmpty && got == want,
      s"missing=${(want.toSet -- got.toSet).take(3)} " +
        s"extra=${(got.toSet -- want.toSet).take(3)}")
  }

  test("q136 HITS scores equal a driver-side integer power iteration") {
    val got = q("q136_hits_centrality")
      .select($"user_id", $"hub1", $"hub2")
      .as[(Long, Long, Long)].collect().toSeq
    val w = rawEvents.groupBy(r => (r._1, r._3)).view
      .mapValues(_.size.toLong).toMap
    val a0 = w.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val h1 = w.groupBy(_._1._1).view
      .mapValues(_.map { case ((_, t), c) => c * a0(t) }.sum).toMap
    val a1 = w.groupBy(_._1._2).view
      .mapValues(_.map { case ((u, _), c) => c * h1(u) }.sum / 1000L).toMap
    val h2 = w.groupBy(_._1._1).view
      .mapValues(_.map { case ((_, t), c) => c * a1(t) }.sum).toMap
    val want = h1.keys.toSeq.map(u => (u, h1(u), h2(u)))
      .sortBy { case (u, x1, x2) => (-x2, -x1, u) }.take(20)
    assert(want.nonEmpty && got == want,
      s"got=${got.take(3)} want=${want.take(3)}")
  }

  test("q137 Gini equals a sort-based rank recomputation") {
    val got = q("q137_gini_tokens")
      .select($"source", $"n_docs", $"total_tokens", $"gini")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val pat = graft.ext.TextStats.BpeishPattern.r
    val docs = Tables.documents(spark, sf)
      .select($"source", $"text").as[(String, String)].collect().toSeq
    docs.groupBy(_._1).foreach { case (src, rows) =>
      val ts = rows.map(r => pat.findAllIn(r._2).size.toLong).sorted
      val n = ts.size.toLong
      val s0 = ts.sum
      val s1 = ts.zipWithIndex.map { case (t, i) => (i + 1) * t }.sum
      val want = (2 * s1 - (n + 1) * s0).toDouble / (n * s0).toDouble
      val (gn, gt, gg) = got(src)
      assert(gn == n && gt == s0, s"$src counts: ($gn,$gt) vs ($n,$s0)")
      assert(math.abs(gg - want) < 5e-7, s"$src gini: $gg vs $want")
    }
  }

  test("q147 TTR/hapax equals a driver-side term-frequency map") {
    val got = q("q147_ttr_hapax")
      .select($"source", $"total_tokens", $"vocab_size", $"hapax_count",
        $"ttr", $"hapax_share")
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val docs = Tables.documents(spark, sf)
      .select($"source", $"text").as[(String, String)].collect().toSeq
    docs.groupBy(_._1).foreach { case (src, rows) =>
      // split(limit = -1): Spark's split keeps trailing empty strings
      // (Java's default split drops them) — the tokenizations must match
      val tf = rows.flatMap(_._2.split("\\s+", -1))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val total = tf.values.sum
      val vocab = tf.size.toLong
      val hapax = tf.values.count(_ == 1L).toLong
      val g = got(src)
      assert((g._2, g._3, g._4) == ((total, vocab, hapax)), s"$src: $g")
      assert(math.abs(g._5 - vocab.toDouble / total) < 5e-7, s"$src ttr")
      assert(math.abs(g._6 - hapax.toDouble / vocab) < 5e-7, s"$src hapax")
    }
  }

  test("q148 percentile grid equals driver-side nearest-rank on sorted lengths") {
    val got = q("q148_length_percentiles")
      .select($"source", $"n_docs", $"p10", $"p50", $"p90")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    val pat = graft.ext.TextStats.BpeishPattern.r
    val docs = Tables.documents(spark, sf)
      .select($"source", $"text").as[(String, String)].collect().toSeq
    docs.groupBy(_._1).foreach { case (src, rows) =>
      val lens = rows.map(r => pat.findAllIn(r._2).size.toLong).sorted
      val n = lens.size
      def pick(p: Int) = lens((p * n + 99) / 100 - 1)
      val want = (n.toLong, pick(10), pick(50), pick(90))
      assert(got(src) == want, s"$src: ${got(src)} vs $want")
    }
  }

  test("q149 new/returning split equals driver-side first-touch attribution") {
    val got = q("q149_new_returning")
      .select(unix_date($"day").as("d"), $"n_active", $"n_new",
        $"n_returning")
      .as[(Int, Long, Long, Long)].collect()
      .map(r => r._1.toLong -> (r._2, r._3, r._4)).toMap
    val grid = rawEvents.map(r => (r._1, r._2 / 86400000000L)).distinct
    val firstDay = grid.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val want = grid.groupBy(_._2).map { case (day, us) =>
      val active = us.size.toLong
      val nw = us.count(u => firstDay(u._1) == day).toLong
      day -> (active, nw, active - nw)
    }
    assert(got == want, s"$got vs $want")
  }

  test("q150 top-decile share equals a driver-side integer-cents sort") {
    val got = q("q150_value_concentration")
      .select($"event_type", $"n_users", $"top_users", $"top10_share")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    rawEvents.groupBy(_._3).foreach { case (et, rows) =>
      val per = rows.groupBy(_._1).view.mapValues(
        _.map(r => math.rint(r._4 * 100).toLong).sum).toSeq
        .sortBy { case (u, c) => (-c, u) }
      val n = per.size
      val k = (n + 9) / 10
      val tot = per.map(_._2).sum
      val top = per.take(k).map(_._2).sum
      val (gn, gk, gs) = got(et)
      assert((gn, gk) == ((n.toLong, k.toLong)), s"$et: ($gn,$gk)")
      if (tot == 0L) assert(gs.isEmpty, s"$et: zero total must be null")
      else assert(math.abs(gs.get - top.toDouble / tot) < 5e-7,
        s"$et share: $gs vs ${top.toDouble / tot}")
    }
  }

  test("q151 weekly churn equals driver-side grid attribution") {
    val got = q("q151_weekly_churn")
      .select(unix_date($"week").as("w"), $"n_active", $"n_churned",
        $"churn_rate")
      .collect()
      .map(r => r.getInt(0).toLong -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // Monday-anchored week start in epoch days: day 0 = Thursday, so
    // Monday ⟺ (d+3) mod 7 == 0 (the q144 convention)
    val grid = rawEvents.map { r =>
      val d = r._2 / 86400000000L
      (r._1, d - ((d + 3) % 7))
    }.distinct
    val byUser = grid.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val maxW = grid.map(_._2).max
    assert(got.keySet == grid.map(_._2).toSet)
    grid.groupBy(_._2).foreach { case (w, us) =>
      val active = us.size.toLong
      val (ga, gc, gr) = got(w)
      assert(ga == active, s"week $w active: $ga vs $active")
      if (w == maxW) assert(gc.isEmpty && gr.isEmpty, s"week $w must be null")
      else {
        val churned = us.count(u => !byUser(u._1).contains(w + 7)).toLong
        assert(gc.contains(churned), s"week $w churned: $gc vs $churned")
        assert(math.abs(gr.get - churned.toDouble / active) < 5e-7,
          s"week $w rate")
      }
    }
  }

  test("q152 gap percentiles equal driver-side sorted-gap nearest-rank") {
    val got = q("q152_gap_percentiles")
      .select($"event_type", $"n_gaps", $"p50_gap_s", $"p90_gap_s",
        $"max_gap_s")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    val seen = scala.collection.mutable.Set[String]()
    rawEvents.groupBy(_._3).foreach { case (et, rows) =>
      // tie order at equal ts cannot change the gap multiset
      // (consecutive diffs of a sorted multiset), so a plain ts sort
      // is the full semantics
      val gaps = rows.groupBy(_._1).values.flatMap { es =>
        val ts = es.map(_._2).sorted
        ts.zip(ts.tail).map { case (a, b) => Math.floorDiv(b - a, 1000000L) }
      }.toSeq.sorted
      if (gaps.nonEmpty) {
        seen += et
        val n = gaps.size
        def pick(p: Int) = gaps((p * n + 99) / 100 - 1)
        val want = (n.toLong, pick(50), pick(90), gaps.last)
        assert(got(et) == want, s"$et: ${got(et)} vs $want")
      }
    }
    assert(got.keySet == seen, s"${got.keySet} vs $seen")
  }

  test("q153 vocab growth equals a driver-side first-occurrence walk") {
    val got = q("q153_vocab_growth")
      .select($"k", $"prefix_docs", $"vocab_size", $"new_terms")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val mn = docs.map(_._1).min
    val offs = docs.map(d => d._1 - mn + 1)
    def bucket(x: Long) = (63 - java.lang.Long.numberOfLeadingZeros(x)).toLong
    val firstOf = scala.collection.mutable.Map[String, Long]()
    docs.foreach { case (id, text) =>
      val off = id - mn + 1
      text.split("\\s+", -1).foreach { t =>
        if (off < firstOf.getOrElse(t, Long.MaxValue)) firstOf(t) = off
      }
    }
    val want = offs.map(bucket).distinct.sorted.map { k =>
      val lim = 1L << (k + 1)
      (k, offs.count(_ < lim).toLong,
        firstOf.values.count(_ < lim).toLong,
        firstOf.values.count(v => bucket(v) == k).toLong)
    }
    assert(got == want, s"$got vs $want")
  }

  test("q154 activity histogram equals driver-side bit-length buckets") {
    val got = q("q154_activity_histogram")
      .select($"bucket", $"n_users", $"min_events", $"max_events",
        $"total_events")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    val per = rawEvents.groupBy(_._1).view.mapValues(_.size.toLong)
      .values.toSeq
    val want = per
      .groupBy(n => (63 - java.lang.Long.numberOfLeadingZeros(n)).toLong)
      .toSeq.map { case (b, ns) =>
        (b, ns.size.toLong, ns.min, ns.max, ns.sum)
      }.sorted
    assert(got == want, s"$got vs $want")
  }

  test("q155 mix shift equals a driver-side day-pair L1 walk") {
    val got = q("q155_mix_shift")
      .select(unix_date($"day").as("d"), $"l1", $"pair_mass", $"l1_share")
      .as[(Int, Long, Long, Double)].collect()
      .map(r => r._1.toLong -> (r._2, r._3, r._4)).toMap
    val counts = rawEvents.groupBy(r => (r._2 / 86400000000L, r._3))
      .view.mapValues(_.size.toLong).toMap
    val days = counts.keySet.map(_._1)
    val keys = (days ++ days.map(_ + 1))
      .filter(d => d > days.min && d <= days.max)
    assert(got.keySet == keys, s"${got.keySet} vs $keys")
    keys.foreach { d =>
      val types = counts.keySet.map(_._2)
      val l1 = types.toSeq.map(t => math.abs(
        counts.getOrElse((d, t), 0L) - counts.getOrElse((d - 1, t), 0L))).sum
      val mass = types.toSeq.map(t =>
        counts.getOrElse((d, t), 0L) + counts.getOrElse((d - 1, t), 0L)).sum
      val (gl, gm, gs) = got(d)
      assert((gl, gm) == ((l1, mass)), s"day $d: ($gl,$gm) vs ($l1,$mass)")
      assert(math.abs(gs - l1.toDouble / mass) < 5e-7, s"day $d share")
    }
  }

  test("q156 daily median equals driver-side sorted-cents nearest rank") {
    val got = q("q156_daily_median_value")
      .select(unix_date($"day").as("d"), $"event_type", $"n_events",
        $"median_cents", $"median_value")
      .as[(Int, String, Long, Long, Double)].collect()
      .map(r => (r._1.toLong, r._2) -> (r._3, r._4, r._5)).toMap
    val cells = rawEvents.groupBy(r => (r._2 / 86400000000L, r._3))
    assert(got.keySet == cells.keySet)
    cells.foreach { case (k, rows) =>
      val cents = rows.map(r => math.rint(r._4 * 100).toLong).sorted
      val n = cents.size
      val med = cents((n + 1) / 2 - 1)
      val (gn, gc, gv) = got(k)
      assert((gn, gc) == ((n.toLong, med)), s"$k: ($gn,$gc) vs ($n,$med)")
      assert(java.lang.Double.compare(gv, med.toDouble / 100) == 0,
        s"$k value must be the bit-exact single division")
    }
  }

  test("q157 calendar coverage equals driver-side span arithmetic") {
    val got = q("q157_calendar_coverage")
      .select($"event_type", unix_date($"first_day"), unix_date($"last_day"),
        $"n_active_days", $"span_days", $"coverage")
      .as[(String, Int, Int, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2.toLong, r._3.toLong, r._4, r._5, r._6)).toMap
    rawEvents.groupBy(_._3).foreach { case (et, rows) =>
      val days = rows.map(_._2 / 86400000000L).distinct
      val span = days.max - days.min + 1
      val (gf, gl, gn, gs, gc) = got(et)
      assert((gf, gl, gn, gs) ==
        ((days.min, days.max, days.size.toLong, span)), s"$et")
      assert(math.abs(gc - days.size.toDouble / span) < 5e-7, s"$et coverage")
    }
  }

  test("q158 dup-size histogram equals a driver-side text-group walk") {
    val got = q("q158_dup_size_hist")
      .select($"cluster_size", $"n_clusters", $"n_docs", $"n_redundant")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    val sizes = Tables.documents(spark, sf)
      .select($"text").as[String].collect().toSeq
      .groupBy(identity).values.map(_.size.toLong).toSeq
    val want = sizes.groupBy(identity).toSeq.map { case (sz, cs) =>
      (sz, cs.size.toLong, sz * cs.size, (sz - 1) * cs.size)
    }.sorted
    assert(got == want, s"$got vs $want")
  }

  test("q159 char classes equal driver-side per-char range tests") {
    // range tests on chars, not a regex — independent of both engines'
    // regex semantics
    val got = q("q159_charclass_profile")
      .select($"source", $"n_docs", $"total_chars", $"n_alpha", $"n_digit",
        $"n_space", $"n_other")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val docs = Tables.documents(spark, sf)
      .select($"source", $"text").as[(String, String)].collect().toSeq
    docs.groupBy(_._1).foreach { case (src, rows) =>
      val cs = rows.flatMap(_._2.toSeq)
      val al = cs.count(c => c >= 'a' && c <= 'z').toLong
      val dg = cs.count(c => c >= '0' && c <= '9').toLong
      val ws = cs.count(" \t\n\r".contains(_)).toLong
      val want = (src, rows.size.toLong, cs.size.toLong, al, dg, ws,
        cs.size - al - dg - ws)
      assert(got(src) == want, s"$src: ${got(src)} vs $want")
    }
  }

  test("q160 magnitude histogram equals driver-side bit-length buckets") {
    val got = q("q160_value_magnitude_hist")
      .select($"event_type", $"bucket", $"n_events", $"min_cents",
        $"max_cents", $"total_cents")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    val want = rawEvents
      .map(r => (r._3, math.rint(r._4 * 100).toLong))
      .groupBy { case (et, c) =>
        (et, (63 - java.lang.Long.numberOfLeadingZeros(c)).toLong)
      }
      .toSeq.map { case ((et, b), rs) =>
        val cs = rs.map(_._2)
        (et, b, cs.size.toLong, cs.min, cs.max, cs.sum)
      }.sorted
    assert(got == want, s"$got vs $want")
  }

  test("q161 hourly profile equals driver-side epoch arithmetic") {
    val got = q("q161_hourly_profile")
      .select($"event_type", $"hour", $"n_events", $"share")
      .as[(String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val byType = rawEvents.groupBy(_._3)
    val cells = rawEvents
      .groupBy(r => (r._3, (r._2 / 3600000000L) % 24))
      .view.mapValues(_.size.toLong).toMap
    assert(got.keySet == cells.keySet)
    cells.foreach { case (k, n) =>
      val tot = byType(k._1).size.toLong
      assert(got(k)._1 == n, s"$k: ${got(k)._1} vs $n")
      assert(math.abs(got(k)._2 - n.toDouble / tot) < 5e-7, s"$k share")
    }
  }

  test("q162 fertility equals a driver-side token count and n_chars audit") {
    val got = q("q162_token_fertility")
      .select($"source", $"n_docs", $"total_chars", $"total_tokens",
        $"n_chars_mismatch", $"chars_per_token")
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val pat = graft.ext.TextStats.BpeishPattern.r
    val docs = Tables.documents(spark, sf)
      .select($"source", $"text", $"n_chars")
      .as[(String, String, Long)].collect().toSeq
    docs.groupBy(_._1).foreach { case (src, rows) =>
      val tc = rows.map(_._2.length.toLong).sum
      val tk = rows.map(r => pat.findAllIn(r._2).size.toLong).sum
      val mm = rows.count(r => r._2.length.toLong != r._3).toLong
      val g = got(src)
      assert((g._2, g._3, g._4, g._5) ==
        ((rows.size.toLong, tc, tk, mm)), s"$src: $g")
      assert(math.abs(g._6 - tc.toDouble / tk) < 5e-7, s"$src fertility")
    }
  }

  test("q163 session grid equals a driver-side gap walk") {
    val got = q("q163_session_percentiles")
      .select($"n_sessions", $"p50_duration_s", $"p90_duration_s",
        $"max_duration_s", $"p50_events", $"p90_events", $"max_events")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    // tie order at equal ts cannot move a session boundary (gap 0)
    val sessions = rawEvents.groupBy(_._1).values.flatMap { es =>
      val ts = es.map(_._2).sorted
      val buf = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer(ts.head))
      ts.tail.foreach { t =>
        if (t - buf.last.last > 1800000000L)
          buf += scala.collection.mutable.ArrayBuffer(t)
        else buf.last += t
      }
      buf.map(ss => (Math.floorDiv(ss.last - ss.head, 1000000L),
        ss.size.toLong))
    }.toSeq
    def grid(vs: Seq[Long]) = {
      val sv = vs.sorted; val n = sv.size
      def pick(p: Int) = sv((p * n + 99) / 100 - 1)
      (pick(50), pick(90), sv.last)
    }
    val (d50, d90, dmx) = grid(sessions.map(_._1))
    val (l50, l90, lmx) = grid(sessions.map(_._2))
    val want = (sessions.size.toLong, d50, d90, dmx, l50, l90, lmx)
    assert(got == want, s"$got vs $want")
  }

  test("q164 Lorenz deciles equal a driver-side sorted-cents walk") {
    val got = q("q164_lorenz_deciles")
      .select($"event_type", $"decile", $"n_users", $"decile_cents",
        $"cum_share")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    val keys = scala.collection.mutable.Set[(String, Long)]()
    rawEvents.groupBy(_._3).foreach { case (et, rows) =>
      val per = rows.groupBy(_._1).view.mapValues(
        _.map(r => math.rint(r._4 * 100).toLong).sum).toSeq
        .sortBy { case (u, c) => (-c, u) }
      val n = per.size.toLong
      val tot = per.map(_._2).sum
      val byDec = per.zipWithIndex
        .map { case ((_, c), i) => ((10 * (i + 1) + n - 1) / n, c) }
        .groupBy(_._1).toSeq.sortBy(_._1)
      var cum = 0L
      byDec.foreach { case (dec, cs) =>
        cum += cs.map(_._2).sum
        keys += ((et, dec))
        val (gn, gc, gs) = got((et, dec))
        assert((gn, gc) == ((cs.size.toLong, cs.map(_._2).sum)),
          s"$et d$dec: ($gn,$gc)")
        assert(math.abs(gs - cum.toDouble / tot) < 5e-7, s"$et d$dec share")
      }
    }
    assert(got.keySet == keys, s"${got.keySet} vs $keys")
  }

  test("q165 conversion lag equals driver-side first-touch diffs") {
    val got = q("q165_conversion_lag")
      .select($"lag_days", $"n_users").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) ->
        r.getLong(1)).toMap
    val want = rawEvents.groupBy(_._1).values.map { es =>
      val fd = es.map(_._2 / 86400000000L).min
      val fps = es.filter(_._3 == "purchase").map(_._2 / 86400000000L)
      if (fps.isEmpty) None else Some(fps.min - fd)
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == want, s"$got vs $want")
  }

  test("q166 Zipf coverage equals a driver-side sorted-frequency walk") {
    val got = q("q166_zipf_coverage")
      .select($"n_terms", $"total_tokens", $"top10_tokens",
        $"top100_tokens", $"top1000_tokens")
      .as[(Long, Long, Long, Long, Long)].collect().head
    val tf = Tables.documents(spark, sf)
      .select($"text").as[String].collect().toSeq
      .flatMap(_.split("\\s+", -1))
      .groupBy(identity).view.mapValues(_.size.toLong).values.toSeq
      .sorted(Ordering[Long].reverse)
    def top(k: Int) = tf.take(k).sum
    val want = (tf.size.toLong, tf.sum, top(10), top(100), top(1000))
    assert(got == want, s"$got vs $want")
  }

  test("q138 change point equals a brute-force integer CUSUM argmax") {
    val got = q("q138_changepoint")
      .select($"event_type", unix_date($"change_day").as("cd"),
        $"n_days", $"max_scaled_dev")
      .as[(String, Int, Long, Long)].collect()
      .map(r => r._1 -> (r._2.toLong, r._3, r._4)).toMap
    rawEvents.groupBy(_._3).foreach { case (et, rows) =>
      val daily = rows.groupBy(_._2 / 86400000000L).view
        .mapValues(_.size.toLong).toSeq.sortBy(_._1)
      val n = daily.size.toLong
      val s = daily.map(_._2).sum
      var p = 0L
      val devs = daily.zipWithIndex.map { case ((day, c), i) =>
        p += c; (day, math.abs(n * p - (i + 1) * s))
      }
      val best = devs.maxBy { case (day, dv) => (dv, -day) }
      assert(got(et) == ((best._1, n, best._2)),
        s"$et: ${got(et)} vs (${best._1}, $n, ${best._2})")
    }
  }

  test("q139 Benford chi2 equals a driver-side digit histogram") {
    val got = q("q139_benford")
      .select($"event_type", $"n_values", $"benford_chi2")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val p = Array(0.0,
      0.3010299956639812, 0.17609125905568124, 0.12493873660829992,
      0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
      0.05799194697768673, 0.05115252244738129, 0.04575749056067514)
    rawEvents.groupBy(_._3).foreach { case (et, rows) =>
      val digits = rows.map(r => math.rint(r._4 * 100).toLong)
        .filter(_ > 0).map(_.toString.head.asDigit)
      val n = digits.size.toLong
      val hist = digits.groupBy(identity).view.mapValues(_.size.toLong).toMap
      var chi2 = 0.0
      for (dg <- 1 to 9) {
        val e = n.toDouble * p(dg)
        val o = hist.getOrElse(dg, 0L).toDouble
        chi2 += (o - e) * (o - e) / e
      }
      val (gn, gc) = got(et)
      assert(gn == n, s"$et n: $gn vs $n")
      assert(math.abs(gc - chi2) < 5e-7, s"$et chi2: $gc vs $chi2")
    }
  }

  test("q140 type-affinity Jaccard equals driver-side set algebra") {
    val got = q("q140_type_affinity")
      .select($"type_a", $"type_b", $"n_a", $"n_b", $"n_both", $"jaccard")
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    Caching.release()
    val userTypes = rawEvents.groupBy(_._1).view
      .mapValues(_.map(_._3).toSet).toMap
    val types = rawEvents.map(_._3).distinct.sorted
    val users = types.map(t =>
      t -> userTypes.filter(_._2.contains(t)).keySet).toMap
    val want = (for (a <- types; b <- types; if a < b;
                     inter = (users(a) & users(b)).size.toLong; if inter > 0)
      yield (a, b) -> (users(a).size.toLong, users(b).size.toLong, inter)).toMap
    assert(want.nonEmpty && got.keySet == want.keySet)
    want.foreach { case (k, (na, nb, inter)) =>
      val (gna, gnb, gboth, gj) = got(k)
      assert((gna, gnb, gboth) == ((na, nb, inter)), s"$k counts")
      assert(math.abs(gj - inter.toDouble / (na + nb - inter)) < 5e-7,
        s"$k jaccard: $gj")
    }
  }

  test("q142 Mann-Kendall S equals a driver-side pair brute force") {
    val got = q("q142_mann_kendall")
      .select($"event_type", $"n_days", $"s_stat", $"tau_a")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    Caching.release()
    rawEvents.groupBy(_._3).foreach { case (et, rows) =>
      val daily = rows.groupBy(_._2 / 86400000000L).view
        .mapValues(_.size.toLong).toSeq.sortBy(_._1).map(_._2)
      val n = daily.size.toLong
      var sStat = 0L
      for (i <- daily.indices; j <- (i + 1) until daily.size)
        sStat += java.lang.Long.signum(daily(j) - daily(i))
      val (gn, gs, gt) = got(et)
      assert((gn, gs) == ((n, sStat)), s"$et: ($gn,$gs) vs ($n,$sStat)")
      if (n < 2) assert(gt.isEmpty, s"$et: n<2 tau must be null")
      else assert(math.abs(gt.get - 2.0 * sStat / (n * (n - 1))) < 5e-7,
        s"$et tau: $gt")
    }
  }

  test("q143 Spearman rho equals driver-side average-rank Pearson") {
    val got = q("q143_spearman_pairs")
      .select($"type_a", $"type_b", $"n_days", $"spearman_rho")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    Caching.release()
    def avgRanks(xs: Seq[Long]): Seq[Double] = {
      val sorted = xs.sorted.zipWithIndex
      val byVal = sorted.groupBy(_._1).view
        .mapValues(g => g.map(_._2 + 1).sum.toDouble / g.size).toMap
      xs.map(byVal)
    }
    val byType = rawEvents.groupBy(_._3).view.mapValues(rows =>
      rows.groupBy(_._2 / 86400000000L).view
        .mapValues(_.size.toLong).toMap).toMap
    val types = byType.keys.toSeq.sorted
    var checked = 0
    for (a <- types; b <- types; if a < b) {
      val days = (byType(a).keySet & byType(b).keySet).toSeq.sorted
      if (days.nonEmpty) {
        checked += 1
        val rx = avgRanks(days.map(byType(a)))
        val ry = avgRanks(days.map(byType(b)))
        val n = days.size.toDouble
        val sx = rx.sum; val sy = ry.sum
        val num = n * rx.zip(ry).map(p => p._1 * p._2).sum - sx * sy
        val dx = n * rx.map(x => x * x).sum - sx * sx
        val dy = n * ry.map(y => y * y).sum - sy * sy
        val (gn, gr) = got((a, b))
        assert(gn == days.size.toLong, s"($a,$b) n: $gn vs ${days.size}")
        if (dx == 0.0 || dy == 0.0)
          assert(gr.isEmpty, s"($a,$b): constant series must be null")
        else assert(math.abs(gr.get - num / math.sqrt(dx * dy)) < 5e-7,
          s"($a,$b) rho: $gr vs ${num / math.sqrt(dx * dy)}")
      }
    }
    assert(checked > 0 && got.size == checked)
  }

  test("q144 weekday chi2 equals a driver-side dow histogram") {
    val got = q("q144_weekday_profile")
      .select($"event_type", $"n_events", $"mon", $"tue", $"wed", $"thu",
        $"fri", $"sat", $"sun", $"dow_chi2")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    rawEvents.groupBy(_._3).foreach { case (et, rows) =>
      val dows = rows.map(r => ((r._2 / 86400000000L + 3) % 7).toInt)
      val h = (0 to 6).map(i => dows.count(_ == i).toLong)
      val n = dows.size.toLong
      val chi2 = (7.0 * h.map(c => BigInt(c) * c).sum.toDouble -
        (BigInt(n) * n).toDouble) / n.toDouble
      val g = got(et)
      assert((g._2, g._3, g._4, g._5, g._6, g._7, g._8, g._9) ==
        ((n, h(0), h(1), h(2), h(3), h(4), h(5), h(6))), s"$et counts: $g")
      assert(math.abs(g._10 - chi2) < 5e-7, s"$et chi2: ${g._10} vs $chi2")
    }
  }

  test("q145 streak histogram equals driver-side gaps-and-islands") {
    val got = q("q145_streak_hist")
      .select($"streak_days", $"n_users")
      .as[(Long, Long)].collect().toMap
    val want = rawEvents.groupBy(_._1).view.mapValues { rows =>
      val days = rows.map(_._2 / 86400000000L).distinct.sorted
      var best = 1L; var cur = 1L
      days.zip(days.drop(1)).foreach { case (a, b) =>
        cur = if (b == a + 1) cur + 1 else 1L
        best = math.max(best, cur)
      }
      best
    }.toMap.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    assert(got == want, s"$got vs $want")
  }

  test("q146 burstiness equals a driver-side exact-sum form") {
    val got = q("q146_burstiness")
      .select($"event_type", $"n_days", $"mean_daily", $"burstiness")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    rawEvents.groupBy(_._3).foreach { case (et, rows) =>
      val daily = rows.groupBy(_._2 / 86400000000L).view
        .mapValues(_.size.toLong).toSeq.map(_._2)
      val n = daily.size.toLong
      val s = daily.sum
      val ss = daily.map(c => BigInt(c) * c).sum
      val root = math.sqrt((BigInt(n) * ss - BigInt(s) * s).toDouble)
      val b = (root - s.toDouble) / (root + s.toDouble)
      val (gn, gm, gb) = got(et)
      assert(gn == n, s"$et n: $gn vs $n")
      assert(math.abs(gm - s.toDouble / n) < 5e-7, s"$et mean: $gm")
      assert(math.abs(gb - b) < 5e-7, s"$et b: $gb vs $b")
    }
  }

  test("q141 lag-1 autocorrelation equals a driver-side scaled-integer form") {
    val got = q("q141_daily_autocorr")
      .select($"event_type", $"n_days", $"lag1_autocorr")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    rawEvents.groupBy(_._3).foreach { case (et, rows) =>
      val daily = rows.groupBy(_._2 / 86400000000L).view
        .mapValues(_.size.toLong).toSeq.sortBy(_._1).map(_._2)
      val n = daily.size.toLong
      val s = daily.sum
      val dev = daily.map(c => n * c - s)
      val num = dev.zip(dev.drop(1)).map { case (a, b) => a * b }.sum
      val den = dev.map(d => d * d).sum
      val (gn, gr) = got(et)
      assert(gn == n, s"$et n_days: $gn vs $n")
      if (den == 0L) assert(gr.isEmpty, s"$et: zero-variance must be null")
      else assert(math.abs(gr.get - num.toDouble / den.toDouble) < 5e-7,
        s"$et r1: $gr vs ${num.toDouble / den.toDouble}")
    }
  }

  // ---- randomized third routes (r18): property-style runs over shapes
  // the fixed corpus doesn't produce — empty/zero groups, single-day
  // types, all-equal counts (total ties), tie storms ----

  test("q137 randomized: histogram-Gini equals sort-based ranks on adversarial shapes") {
    val rnd = new scala.util.Random(137)
    def doc(nWords: Int): String =
      Seq.fill(nWords)("w" + rnd.nextInt(50)).mkString(" ")
    // sources: three random length mixes, a single-doc source, an
    // all-equal source (gini must be exactly 0), a tie-storm source
    // (many docs over two lengths), and an all-empty source (gini null)
    val rows: Seq[(Long, String, String)] =
      (Seq.tabulate(3) { s =>
        Seq.fill(40 + rnd.nextInt(40))(doc(rnd.nextInt(30)))
          .map(t => (s"rand$s", t))
      }.flatten ++
        Seq("single" -> doc(7)) ++
        Seq.fill(25)("equal" -> "a b c d e") ++
        (Seq.fill(30)("ties" -> "x y") ++ Seq.fill(30)("ties" -> "x y z w")) ++
        Seq.fill(6)("allempty" -> ""))
        .zipWithIndex.map { case ((src, txt), i) => (i.toLong, src, txt) }
    val dir = java.nio.file.Files.createTempDirectory("graft_q137r").toString
    rows.toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q137_gini_tokens")(spark, dir)
      .select($"source", $"n_docs", $"total_tokens", $"gini")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    Caching.release()
    val pat = graft.ext.TextStats.BpeishPattern.r
    rows.groupBy(_._2).foreach { case (src, docs) =>
      val ts = docs.map(d => pat.findAllIn(d._3).size.toLong).sorted
      val n = ts.size.toLong
      val s0 = ts.sum
      val s1 = ts.zipWithIndex.map { case (t, i) => (i + 1) * t }.sum
      val (gn, gt, gg) = got(src)
      assert(gn == n && gt == s0, s"$src counts: ($gn,$gt) vs ($n,$s0)")
      if (s0 == 0L) assert(gg.isEmpty, s"$src: zero-mass gini must be null")
      else {
        val want = (2 * s1 - (n + 1) * s0).toDouble / (n * s0).toDouble
        assert(math.abs(gg.get - want) < 5e-7, s"$src gini: $gg vs $want")
      }
    }
    assert(got("equal")._3.contains(0.0), "all-equal source must have gini 0")
  }

  test("q138 randomized: CUSUM argmax equals brute force on adversarial day shapes") {
    val rnd = new scala.util.Random(138)
    def ts(day: Int, i: Int): String =
      f"2024-01-${day + 1}%02d ${i % 24}%02d:${i % 60}%02d:00"
    // types: random daily streams (sparse days), a single-day type
    // (n=1, dev 0), an all-equal-counts type (every dev 0 — the tie
    // must break to the EARLIEST day), and a two-sided tie storm
    val rows = scala.collection.mutable.ArrayBuffer[(Long, String, String)]()
    for (s <- 0 until 3; day <- 0 until 20; if rnd.nextInt(3) > 0;
         i <- 0 until (1 + rnd.nextInt(5)))
      rows += ((rows.size.toLong, ts(day, i), s"rand$s"))
    for (i <- 0 until 4) rows += ((rows.size.toLong, ts(11, i), "oneday"))
    for (day <- 0 until 10; i <- 0 until 3)
      rows += ((rows.size.toLong, ts(day, i), "allequal"))
    for ((day, c) <- Seq(0 -> 1, 1 -> 3, 2 -> 3, 3 -> 1); i <- 0 until c)
      rows += ((rows.size.toLong, ts(day, i), "mirror")) // symmetric devs tie
    val dir = java.nio.file.Files.createTempDirectory("graft_q138r").toString
    rows.toSeq.toDF("event_id", "tss", "event_type")
      .withColumn("ts", to_timestamp_ntz($"tss"))
      .withColumn("user_id", $"event_id" % 5)
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q138_changepoint")(spark, dir)
      .select($"event_type", unix_date($"change_day").as("cd"),
        $"n_days", $"max_scaled_dev")
      .as[(String, Int, Long, Long)].collect()
      .map(r => r._1 -> (r._2.toLong, r._3, r._4)).toMap
    Caching.release()
    val dayOf = rows.groupBy(_._3).view.mapValues(_.map { r =>
      r._2.take(10) }.toSeq).toMap
    dayOf.foreach { case (et, dayStrs) =>
      val epochDay = dayStrs.map(s =>
        java.time.LocalDate.parse(s).toEpochDay)
      val daily = epochDay.groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      val n = daily.size.toLong
      val s = daily.map(_._2).sum
      var p = 0L
      val devs = daily.zipWithIndex.map { case ((day, c), i) =>
        p += c; (day, math.abs(n * p - (i + 1) * s))
      }
      val best = devs.maxBy { case (day, dv) => (dv, -day) }
      assert(got(et) == ((best._1, n, best._2)),
        s"$et: ${got(et)} vs (${best._1}, $n, ${best._2})")
    }
    // the all-equal type's devs are ALL zero: earliest day must win
    assert(got("allequal")._1 == java.time.LocalDate.parse("2024-01-01").toEpochDay)
    assert(got("allequal")._3 == 0L)
  }

  test("q167 RFM grid equals a driver-side sorted-rank walk") {
    val got = q("q167_rfm_segments")
      .select($"r_q", $"f_q", $"m_q", $"n_users", $"n_events",
        $"total_cents")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> (r._4, r._5, r._6)).toMap
    val per = rawEvents.groupBy(_._1).toSeq.map { case (u, rows) =>
      (u, rows.map(_._2 / 86400000000L).max, rows.size.toLong,
        rows.map(r => math.rint(r._4 * 100).toLong).sum)
    }
    val n = per.size
    def quint(rank0: Int) = (5L * (rank0 + 1) + n - 1) / n
    def ranks(key: ((Long, Long, Long, Long)) => (Long, Long)) =
      per.sortBy(key).zipWithIndex
        .map { case ((u, _, _, _), i) => u -> quint(i) }.toMap
    val rQ = ranks { case (u, ld, _, _) => (-ld, u) }
    val fQ = ranks { case (u, _, f, _) => (-f, u) }
    val mQ = ranks { case (u, _, _, c) => (-c, u) }
    val want = per.groupBy { case (u, _, _, _) => (rQ(u), fQ(u), mQ(u)) }
      .view.mapValues(rs =>
        (rs.size.toLong, rs.map(_._3).sum, rs.map(_._4).sum)).toMap
    assert(got == want, s"$got vs $want")
  }

  test("q168 touch matrix equals a driver-side per-user path walk") {
    val got = q("q168_touch_matrix")
      .select($"first_touch", $"last_touch", $"n_users")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val raw = Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts"), $"event_id", $"event_type")
      .as[(Long, Long, Long, String)].collect().toSeq
    val want = raw.groupBy(_._1).values.flatMap { es =>
      val path = es.sortBy(e => (e._2, e._3)).map(_._4)
      val fp = path.indexOf("purchase")
      if (fp < 0) None
      else Some((path.head, if (fp == 0) "(start)" else path(fp - 1)))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == want, s"$got vs $want")
  }

  test("q170 dominance histogram equals driver-side integer shares") {
    val got = q("q170_dominance_hist")
      .select($"dominance_decile", $"n_users", $"n_events")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val want = rawEvents.groupBy(_._1).values.map { es =>
      val n = es.size.toLong
      val cmax = es.groupBy(_._3).values.map(_.size.toLong).max
      ((10L * cmax + n - 1) / n, n)
    }.toSeq.groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    assert(got == want, s"$got vs $want")
  }

  test("q169 source matrix equals a driver-side banded-MinHash recompute") {
    // fully independent pair derivation: Scala tokenize → 3-shingles →
    // md5-prefix ids → 16 affine minhashes → 4 bands → bucket
    // candidates → exact-Jaccard >= 0.5 — no call into TextOps'
    // Column forms or the native sig expression (constants shared by
    // contract: ext.TextOps.hashA/hashB/MinhashPrime)
    val got = q("q169_dup_source_matrix")
      .select($"src_a", $"src_b", $"n_pairs")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text", $"source")
      .as[(Long, String, String)].collect().toSeq
    import graft.ext.TextOps
    val md = java.security.MessageDigest.getInstance("MD5")
    def h28(g: String): Long = {
      val d = md.digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val v = ((d(0) & 0xFFL) << 16) | ((d(1) & 0xFFL) << 8) | (d(2) & 0xFFL)
      (v << 4) | ((d(3) & 0xFF) >>> 4)
    }
    val sigs = docs.flatMap { case (id, text, _) =>
      val w = text.split("\\s+", -1)
      if (w.length < TextOps.ShingleK) None
      else {
        val sh = (0 to w.length - TextOps.ShingleK)
          .map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").distinct
        val ids = sh.map(h28)
        val m = (0 until TextOps.NumHashes).map(j => ids.map(x =>
          (TextOps.hashA(j) * x + TextOps.hashB(j)) %
            TextOps.MinhashPrime).min)
        Some((id, sh.toSet, m))
      }
    }
    val cand = sigs.flatMap { case (id, _, m) =>
        (0 until TextOps.Bands).map(bi =>
          (bi, m.slice(bi * 4, bi * 4 + 4)) -> id)
      }.groupBy(_._1).values.flatMap { g =>
        val ids = g.map(_._2).sorted
        for (i <- ids.indices; j <- i + 1 until ids.size)
          yield (ids(i), ids(j))
      }.toSet
    val shOf = sigs.map(s => s._1 -> s._2).toMap
    val srcOf = docs.map(dd => dd._1 -> dd._3).toMap
    val want = cand.toSeq
      .filter { case (a, b) =>
        val (sa, sb) = (shOf(a), shOf(b))
        val inter = sa.intersect(sb).size.toDouble
        inter / (sa.size + sb.size - inter) >= 0.5
      }
      .map { case (a, b) =>
        val (x, y) = (srcOf(a), srcOf(b))
        (if (x <= y) x else y, if (x <= y) y else x)
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == want, s"$got vs $want")
    assert(got.nonEmpty, "fixture must produce near-dup pairs")
  }

  test("q171 survival curve equals a driver-side lifespan walk") {
    val got = q("q171_survival_curve")
      .select($"lifespan_days", $"n_ending", $"survivors",
        $"surviving_share")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val spans = rawEvents.groupBy(_._1).values.map { es =>
      val ds = es.map(_._2 / 86400000000L)
      ds.max - ds.min
    }.toSeq
    val n = spans.size.toLong
    val hist = spans.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    var remaining = n
    val want = hist.map { case (l, m) =>
      val surv = remaining; remaining -= m
      (l, m, surv, surv.toDouble / n)
    }
    assert(got.map(r => (r._1, r._2, r._3)) ==
      want.map(r => (r._1, r._2, r._3)), s"$got vs $want")
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._4 - w._4) < 5e-7, s"share at ${g._1}")
    }
  }

  test("q172 shingle novelty equals a driver-side set walk") {
    val got = q("q172_shingle_novelty")
      .select($"source", $"n_shingles", $"n_unique", $"unique_share")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val docs = Tables.documents(spark, sf)
      .select($"source", $"text").as[(String, String)].collect().toSeq
    val bySrc: Map[String, Set[String]] = docs.groupBy(_._1).view
      .mapValues(_.flatMap { case (_, t) =>
        val w = t.split("\\s+", -1)
        if (w.length < 3) Seq.empty[String]
        else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}")
      }.toSet).toMap
    val srcCount = bySrc.toSeq
      .flatMap { case (src, gs) => gs.map(_ -> src) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    bySrc.foreach { case (src, gs) =>
      val uq = gs.count(g => srcCount(g) == 1).toLong
      val (gn, gu, gs6) = got(src)
      assert((gn, gu) == ((gs.size.toLong, uq)), s"$src: ($gn,$gu)")
      assert(math.abs(gs6 - uq.toDouble / gs.size) < 5e-7, s"$src share")
    }
    assert(got.keySet == bySrc.keySet)
  }

  test("q173 stickiness equals a driver-side 28-day window walk") {
    val got = q("q173_stickiness")
      .select(datediff($"day", lit("1970-01-01")).cast("long"),
        $"dau", $"mau28", $"stickiness")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val ud = rawEvents.map(e => (e._1, e._2 / 86400000000L)).distinct
    val days = ud.map(_._2).distinct.sorted
    assert(got.keySet == days.toSet)
    days.foreach { dy =>
      val dau = ud.count(_._2 == dy).toLong
      val mau = ud.filter(u => u._2 >= dy - 27 && u._2 <= dy)
        .map(_._1).distinct.size.toLong
      val (gd, gm, gst) = got(dy)
      assert((gd, gm) == ((dau, mau)), s"day $dy: ($gd,$gm) vs ($dau,$mau)")
      assert(math.abs(gst - dau.toDouble / mau) < 5e-7, s"day $dy ratio")
    }
  }

  test("q174 lift equals driver-side contingency arithmetic") {
    val got = q("q174_source_lang_lift")
      .select($"source", $"lang", $"n_docs", $"excess_x_n", $"lift")
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val cells = Tables.documents(spark, sf)
      .select($"source", $"lang").as[(String, String)].collect().toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val r = cells.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    val c = cells.toSeq.groupBy(_._1._2).view
      .mapValues(_.map(_._2).sum).toMap
    val t = cells.values.sum
    cells.foreach { case ((src, lg), o) =>
      val excess = o * t - r(src) * c(lg)
      val lift = BigDecimal((o * t).toDouble / (r(src) * c(lg)).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (gn, ge, gl) = got((src, lg))
      assert((gn, ge) == ((o, excess)), s"($src,$lg): ($gn,$ge)")
      assert(math.abs(gl - lift) < 5e-7, s"($src,$lg) lift $gl vs $lift")
    }
    assert(got.keySet == cells.keySet)
  }

  test("q175 containment pairs equal a driver-side anchor recompute") {
    val got = q("q175_containment_pairs")
      .select($"a_id", $"b_id", $"n_shared", $"n_a", $"n_b")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val sets: Map[Long, Set[String]] = docs.flatMap { case (id, t) =>
      val w = t.split("\\s+", -1)
      if (w.length < 3) None
      else Some(id -> (0 to w.length - 3)
        .map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet)
    }.toMap
    val df = sets.toSeq.flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val cand = df.values.filter(ids => ids.size >= 2 && ids.size <= 10)
      .flatMap { ids =>
        val s = ids.toSeq.sorted
        for (i <- s.indices; j <- i + 1 until s.size) yield (s(i), s(j))
      }.toSet
    val want = cand.toSeq.flatMap { case (a, b) =>
      val inter = sets(a).intersect(sets(b)).size.toLong
      val (na, nb) = (sets(a).size.toLong, sets(b).size.toLong)
      if (inter * 5 >= math.min(na, nb) * 4) Some((a, b) -> ((inter, na, nb)))
      else None
    }.toMap
    assert(got == want, s"$got vs $want")
    assert(got.nonEmpty, "fixture must produce containment pairs")
  }

  test("q176 audience overlap equals a driver-side set walk") {
    val got = q("q176_audience_overlap")
      .select($"type_a", $"type_b", $"n_a", $"n_b", $"n_both", $"jaccard")
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    val byType = rawEvents.map(e => (e._3, e._1)).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val types = byType.keys.toSeq.sorted
    val want = (for (i <- types.indices; j <- i + 1 until types.size)
      yield (types(i), types(j))).flatMap { case (a, b) =>
        val nb = byType(a).intersect(byType(b)).size.toLong
        if (nb == 0) None
        else {
          val (na2, nb2) = (byType(a).size.toLong, byType(b).size.toLong)
          Some((a, b) -> ((na2, nb2, nb, nb.toDouble / (na2 + nb2 - nb))))
        }
      }.toMap
    assert(got.keySet == want.keySet, s"$got vs $want")
    want.foreach { case (k, (na, nb2, both, j)) =>
      val g = got(k)
      assert((g._1, g._2, g._3) == ((na, nb2, both)), s"$k: $g")
      assert(math.abs(g._4 - j) < 5e-7, s"$k jaccard")
    }
  }

  test("q177 weekly seasonality equals a driver-side BigInt walk") {
    val got = q("q177_weekly_seasonality")
      .select($"event_type", $"n_points", $"n_pairs", $"lag7_autocorr")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    rawEvents.groupBy(_._3).foreach { case (et, rows) =>
      val daily = rows.map(_._2 / 86400000000L)
        .groupBy(identity).view.mapValues(v => BigInt(v.size)).toMap
      val n = BigInt(daily.size); val s = daily.values.sum
      def dev(c: BigInt) = n * c - s
      val pairs = daily.toSeq.flatMap { case (d, c) =>
        daily.get(d - 7).map(p => (dev(c), dev(p))) }
      val num = pairs.map(p => p._1 * p._2).sum
      val den = daily.values.map(c => dev(c) * dev(c)).sum
      val (gn, gp, ga) = got(et)
      assert((gn, gp) == ((daily.size.toLong, pairs.size.toLong)), s"$et")
      if (den == 0 || pairs.isEmpty) assert(ga.isEmpty, s"$et: $ga")
      else {
        val want = math.rint(
          (BigDecimal(num) / BigDecimal(den)).toDouble * 1e6) / 1e6
        assert(ga.contains(want), s"$et: $ga vs $want")
      }
    }
  }

  test("q178 median drift equals a driver-side weekly-median walk") {
    val got = q("q178_median_drift")
      .select($"event_type", $"n_weeks", $"max_shift_cents",
        datediff($"shift_week", lit("1970-01-01")).cast("long"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    rawEvents.groupBy(_._3).foreach { case (et, rows) =>
      val byWeek = rows.map { r =>
        val ed = r._2 / 86400000000L
        (ed - java.lang.Math.floorMod(ed - 4L, 7L),
          math.rint(r._4 * 100).toLong)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      val weeks = byWeek.keys.toSeq.sorted
      def lowerMedian(v: Seq[Long]): Long =
        v.zipWithIndex.collectFirst {
          case (c, i) if (i + 1) * 2 >= v.size => c }.get
      val med = weeks.map(w => lowerMedian(byWeek(w)))
      if (weeks.size >= 2) {
        val shifts = weeks.drop(1).zip(
          med.zip(med.drop(1)).map { case (p, c) => math.abs(c - p) })
        val best = shifts.maxBy { case (w, sh) => (sh, -w) }
        assert(got(et) == ((weeks.size.toLong, best._2, best._1)),
          s"$et: ${got(et)} vs (${weeks.size}, ${best._2}, ${best._1})")
      } else assert(!got.contains(et), s"$et should drop with one week")
    }
  }

  test("q179 embedding dim audit equals a driver-side array walk") {
    val got = q("q179_embedding_dims")
      .select($"dim", $"n", $"n_nan", $"n_zero", $"n_neg",
        $"min_v", $"max_v")
      .as[(Int, Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    val vecs = Tables.embeddings(spark, sf)
      .select($"embedding").as[Seq[Float]].collect().toSeq
    val dims = vecs.head.size
    assert(got.keySet == (0 until dims).toSet)
    (0 until dims).foreach { i =>
      val xs = vecs.map(_(i))
      val want = (xs.size.toLong, xs.count(_.isNaN).toLong,
        xs.count(_ == 0f).toLong, xs.count(_ < 0f).toLong,
        xs.min.toDouble, xs.max.toDouble)
      assert(got(i) == want, s"dim $i: ${got(i)} vs $want")
    }
  }

  test("q180 price deviation equals a driver-side join walk") {
    val got = q("q180_price_deviation")
      .select($"bucket_lo_bp", $"n_items", $"min_dev_bp", $"max_dev_bp")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val retail = Tables.part(spark, sf)
      .select($"p_partkey", $"p_retailprice").as[(Long, Double)]
      .collect().map(p => p._1 -> math.rint(p._2 * 100).toLong).toMap
    val devs = Tables.lineitem(spark, sf)
      .select($"l_partkey", $"l_extendedprice", $"l_quantity")
      .as[(Long, Double, Double)].collect().toSeq
      .map { case (pk, ep, qt) =>
        val ec = math.rint(ep * 100).toLong
        val q0 = math.rint(qt).toLong
        ec * 10000L / (q0 * retail(pk)) - 10000L
      }
    val want = devs.groupBy(d => math.floor(d / 100.0).toLong * 100)
      .view.mapValues(v => (v.size.toLong, v.min, v.max)).toMap
    assert(got == want,
      s"${got.size} buckets vs ${want.size}; diff=${(got.keySet diff want.keySet) ++ (want.keySet diff got.keySet)}")
  }

  test("q181 shingle df profile equals a driver-side df walk") {
    val got = q("q181_shingle_df_profile")
      .select($"df_bucket", $"n_shingles", $"postings",
        $"min_df", $"max_df", $"postings_share")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    val docs = Tables.documents(spark, sf)
      .select($"text").as[String].collect().toSeq
    val dfm = docs.flatMap { t =>
      val w = t.split("\\s+", -1)
      if (w.length < 3) Seq.empty[String]
      else (0 to w.length - 3)
        .map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").distinct
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = dfm.values.sum
    val want = dfm.values.groupBy(df => 63L - java.lang.Long.numberOfLeadingZeros(df))
      .view.mapValues(v =>
        (v.size.toLong, v.sum, v.min, v.max)).toMap
    assert(got.view.mapValues(g => (g._1, g._2, g._3, g._4)).toMap == want,
      s"$got vs $want")
    got.foreach { case (b, g) =>
      assert(math.abs(g._5 - want(b)._2.toDouble / total) < 5e-7, s"bucket $b share")
    }
  }

  test("q182 segment trend equals a driver-side BigInt OLS") {
    val got = q("q182_segment_trend")
      .select($"c_mktsegment", $"n_months", $"slope_cents_per_month")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val seg = Tables.customer(spark, sf)
      .select($"c_custkey", $"c_mktsegment").as[(Long, String)]
      .collect().toMap
    val monthly = Tables.orders(spark, sf)
      .select($"o_custkey", year($"o_orderdate"), month($"o_orderdate"),
        $"o_totalprice")
      .as[(Long, Int, Int, Double)].collect().toSeq
      .map(o => ((seg(o._1), (o._2 - 1995) * 12 + o._3 - 1),
        math.rint(o._4 * 100).toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .map { case ((sg, mi), yc) => (sg, BigInt(mi), BigInt(yc)) }
    monthly.groupBy(_._1).foreach { case (sg, rows) =>
      val n = BigInt(rows.size)
      val sx = rows.map(_._2).sum; val sy = rows.map(_._3).sum
      val sxy = rows.map(r => r._2 * r._3).sum
      val sxx = rows.map(r => r._2 * r._2).sum
      val want = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
        (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble)
      val g = got(sg)
      assert(g._1 == rows.size.toLong, s"$sg months")
      assert(java.lang.Double.compare(g._2, want) == 0,
        s"$sg: ${g._2} vs $want") // bit-exact by design
    }
  }

  test("q183 order reconciliation equals a driver-side join walk") {
    val got = q("q183_order_reconciliation")
      .select($"bucket_lo_bp", $"n_orders", $"min_dev_bp", $"max_dev_bp")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val lc = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_extendedprice").as[(Long, Double)]
      .collect().toSeq.groupBy(_._1).view
      .mapValues(_.map(v => math.rint(v._2 * 100).toLong).sum).toMap
    val devs = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_totalprice").as[(Long, Double)]
      .collect().toSeq
      .flatMap { case (ok, tp) => lc.get(ok).map(l =>
        l * 10000L / math.rint(tp * 100).toLong - 10000L) }
    val want = devs.groupBy(d => math.floor(d / 100.0).toLong * 100)
      .view.mapValues(v => (v.size.toLong, v.min, v.max)).toMap
    assert(got == want, s"${got.size} vs ${want.size} buckets")
  }

  test("q184 supplier concentration equals a driver-side argmax walk") {
    val got = q("q184_supplier_concentration")
      .select($"p_brand", $"n_suppliers", $"top_suppkey", $"top_cents",
        $"brand_cents", $"top_share")
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    val brand = Tables.part(spark, sf)
      .select($"p_partkey", $"p_brand").as[(Long, String)].collect().toMap
    val cells = Tables.lineitem(spark, sf)
      .select($"l_partkey", $"l_suppkey", $"l_extendedprice")
      .as[(Long, Long, Double)].collect().toSeq
      .map(l => ((brand(l._1), l._2), math.rint(l._3 * 100).toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .map { case ((b, sk), c) => (b, sk, c) }
    cells.groupBy(_._1).foreach { case (b, rows) =>
      val bc = rows.map(_._3).sum
      val top = rows.minBy(r => (-r._3, r._2))
      val g = got(b)
      assert((g._1, g._2, g._3, g._4) ==
        ((rows.size.toLong, top._2, top._3, bc)), s"$b: $g")
      assert(math.abs(g._5 - top._3.toDouble / bc) < 5e-7, s"$b share")
    }
    assert(got.keySet == cells.map(_._1).toSet)
  }

  test("q185 ship lag percentiles equal a driver-side nearest-rank walk") {
    val got = q("q185_ship_lag_percentiles")
      .select($"o_orderpriority", $"n_lines", $"p50_days", $"p90_days",
        $"max_days")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val od = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_orderpriority",
        datediff($"o_orderdate".cast("date"), lit("1970-01-01")))
      .as[(Long, String, Int)].collect()
      .map(o => o._1 -> ((o._2, o._3))).toMap
    val lags = Tables.lineitem(spark, sf)
      .select($"l_orderkey",
        datediff($"l_shipdate".cast("date"), lit("1970-01-01")))
      .as[(Long, Int)].collect().toSeq
      .map { case (ok, sd) =>
        val (pr, odd) = od(ok); (pr, (sd - odd).toLong) }
    lags.groupBy(_._1).foreach { case (pr, rows) =>
      val sv = rows.map(_._2).sorted
      def pick(p: Int) = sv.zipWithIndex.collectFirst {
        case (v, i) if (i + 1) * 100 >= p * sv.size => v }.get
      val want = (sv.size.toLong, pick(50), pick(90), sv.last)
      assert(got(pr) == want, s"$pr: ${got(pr)} vs $want")
    }
  }

  test("q186 repeat share equals a driver-side first-order walk") {
    val got = q("q186_repeat_share")
      .select($"month_index", $"n_orders", $"n_repeat", $"repeat_share")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val orders = Tables.orders(spark, sf)
      .select($"o_custkey", $"o_orderkey",
        datediff($"o_orderdate".cast("date"), lit("1970-01-01")),
        (year($"o_orderdate") - 1995) * 12 + month($"o_orderdate") - 1)
      .as[(Long, Long, Int, Int)].collect().toSeq
    val firstOf = orders.groupBy(_._1).view
      .mapValues(_.map(o => (o._3, o._2)).min).toMap
    val want = orders
      .map(o => (o._4.toLong, (o._3, o._2) != firstOf(o._1)))
      .groupBy(_._1).view.mapValues { v =>
        (v.size.toLong, v.count(_._2).toLong) }.toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (mi, (n, rep)) =>
      val g = got(mi)
      assert((g._1, g._2) == ((n, rep)), s"month $mi: $g vs ($n,$rep)")
      assert(math.abs(g._3 - rep.toDouble / n) < 5e-7, s"month $mi share")
    }
  }

  test("q187 session conversion equals a driver-side gap walk") {
    val got = q("q187_session_conversion")
      .select($"len_bucket", $"n_sessions", $"n_converting",
        $"conversion_rate")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val raw = Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts"), $"event_id", $"event_type")
      .as[(Long, Long, Long, String)].collect().toSeq
    val sessions = raw.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._2, e._3))
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean)]
      var len = 0L; var conv = false; var prev = Long.MinValue
      sorted.foreach { e =>
        if (prev != Long.MinValue && e._2 - prev > 1800000000L) {
          out += ((len, conv)); len = 0; conv = false
        }
        len += 1; conv ||= e._4 == "purchase"; prev = e._2
      }
      out += ((len, conv)); out
    }.toSeq
    val want = sessions
      .groupBy(s => 63L - java.lang.Long.numberOfLeadingZeros(s._1))
      .view.mapValues(v => (v.size.toLong, v.count(_._2).toLong)).toMap
    assert(got.view.mapValues(g => (g._1, g._2)).toMap == want,
      s"$got vs $want")
    got.foreach { case (b, g) =>
      assert(math.abs(g._3 - want(b)._2.toDouble / want(b)._1) < 5e-7,
        s"bucket $b rate")
    }
  }

  test("q188 token revenue equals a driver-side sort walk") {
    val got = q("q188_name_token_revenue")
      .select($"rank", $"token", $"revenue_cents")
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    val pc = Tables.lineitem(spark, sf)
      .select($"l_partkey", $"l_extendedprice").as[(Long, Double)]
      .collect().toSeq.groupBy(_._1).view
      .mapValues(_.map(v => math.rint(v._2 * 100).toLong).sum).toMap
    val want = Tables.part(spark, sf)
      .select($"p_partkey", $"p_name").as[(Long, String)].collect().toSeq
      .flatMap { case (pk, name) =>
        pc.get(pk).toSeq.flatMap(c => name.split(" ").map(_ -> c)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(20).zipWithIndex
      .map { case ((t, c), i) => (i + 1L, t, c) }
    assert(got == want, s"$got vs $want")
  }

  test("q189 cohort LTV equals a driver-side first-order walk") {
    val got = q("q189_cohort_ltv")
      .select($"cohort_month", $"age_months", $"n_customers",
        $"n_orders", $"total_cents", $"cents_per_customer")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    val os = Tables.orders(spark, sf)
      .select($"o_custkey",
        (year($"o_orderdate") - 1995) * 12 + month($"o_orderdate") - 1,
        $"o_totalprice")
      .as[(Long, Int, Double)].collect().toSeq
      .map(o => (o._1, o._2.toLong, math.rint(o._3 * 100).toLong))
    val cohortOf = os.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val want = os.groupBy(o => (cohortOf(o._1), o._2 - cohortOf(o._1)))
      .view.mapValues { v =>
        (v.map(_._1).distinct.size.toLong, v.size.toLong, v.map(_._3).sum)
      }.toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, (nc, no, tc)) =>
      val g = got(k)
      assert((g._1, g._2, g._3) == ((nc, no, tc)), s"$k: $g")
      assert(math.abs(g._4 - tc.toDouble / nc) < 5e-7, s"$k per-customer")
    }
  }

  test("q167 randomized: quintile ties split by user_id on adversarial shapes") {
    // shapes the corpus never produces: massive ties on every axis
    // (same last day, same frequency, same cents — the nearest-rank
    // formula must split them by user_id identically on both engines),
    // plus n < 5 users' worth of distinct values
    val rnd = new scala.util.Random(167)
    val rows = scala.collection.mutable.ArrayBuffer[(Long, String, Long, Double)]()
    def ts(day: Int, i: Int): String =
      f"2024-01-${day + 1}%02d ${i % 24}%02d:${i % 60}%02d:00"
    // 12 "clone" users: identical one-event histories (all three axes tie)
    for (u <- 0 until 12)
      rows += ((rows.size.toLong, ts(5, 1), u.toLong, 7.25))
    // 8 random users
    for (u <- 12 until 20; i <- 0 to rnd.nextInt(6))
      rows += ((rows.size.toLong, ts(rnd.nextInt(20), i), u.toLong,
        (rnd.nextInt(20000) - 5000) / 100.0))
    val dir = java.nio.file.Files.createTempDirectory("graft_q167r").toString
    rows.toSeq.toDF("event_id", "tss", "user_id", "value")
      .withColumn("ts", to_timestamp_ntz($"tss"))
      .withColumn("event_type", lit("view")).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q167_rfm_segments")(spark, dir)
      .select($"r_q", $"f_q", $"m_q", $"n_users", $"n_events",
        $"total_cents")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> ((r._4, r._5, r._6))).toMap
    Caching.release()
    val per = rows.toSeq.groupBy(_._3).toSeq.map { case (u, es) =>
      (u, es.map(e => java.time.LocalDate.parse(e._2.take(10)).toEpochDay).max,
        es.size.toLong, es.map(e => math.rint(e._4 * 100).toLong).sum)
    }
    val n = per.size
    def quint(rank0: Int) = (5L * (rank0 + 1) + n - 1) / n
    def ranks(key: ((Long, Long, Long, Long)) => (Long, Long)) =
      per.sortBy(key).zipWithIndex
        .map { case ((u, _, _, _), i) => u -> quint(i) }.toMap
    val rQ = ranks { case (u, ld, _, _) => (-ld, u) }
    val fQ = ranks { case (u, _, f, _) => (-f, u) }
    val mQ = ranks { case (u, _, _, c) => (-c, u) }
    val want = per.groupBy { case (u, _, _, _) => (rQ(u), fQ(u), mQ(u)) }
      .view.mapValues(rs =>
        (rs.size.toLong, rs.map(_._3).sum, rs.map(_._4).sum)).toMap
    assert(got == want, s"$got vs $want")
    // the 12 clones MUST spread across quintiles, not collapse into one
    assert(got.keySet.map(_._1).size >= 3, s"tie split lost: ${got.keySet}")
  }

  test("q173 randomized: stickiness windows on gappy adversarial calendars") {
    // isolated actives, a user active EXACTLY 27 days before a window
    // end (inclusive boundary), and long dead stretches
    val rnd = new scala.util.Random(173)
    val rows = scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
    def ts(day: Int): String = {
      val d = java.time.LocalDate.of(2024, 1, 1).plusDays(day)
      s"$d 12:00:00"
    }
    for (u <- 0 until 10; d <- 0 until 60; if rnd.nextInt(8) == 0)
      rows += ((rows.size.toLong, ts(d), u.toLong))
    rows += ((rows.size.toLong, ts(0), 100L))  // boundary pair: active
    rows += ((rows.size.toLong, ts(27), 100L)) // on both window edges
    rows += ((rows.size.toLong, ts(59), 101L)) // isolated single-day user
    val dir = java.nio.file.Files.createTempDirectory("graft_q173r").toString
    rows.toSeq.toDF("event_id", "tss", "user_id")
      .withColumn("ts", to_timestamp_ntz($"tss"))
      .withColumn("event_type", lit("view"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q173_stickiness")(spark, dir)
      .select(datediff($"day", lit("1970-01-01")).cast("long"),
        $"dau", $"mau28")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    Caching.release()
    val ud = rows.toSeq.map(r =>
      (r._3, java.time.LocalDate.parse(r._2.take(10)).toEpochDay)).distinct
    val days = ud.map(_._2).distinct.sorted
    assert(got.keySet == days.toSet)
    days.foreach { dy =>
      val dau = ud.count(_._2 == dy).toLong
      val mau = ud.filter(u => u._2 >= dy - 27 && u._2 <= dy)
        .map(_._1).distinct.size.toLong
      assert(got(dy) == ((dau, mau)), s"day $dy: ${got(dy)} vs ($dau,$mau)")
    }
  }

  test("q178 randomized: median-shift ties break to the earliest week") {
    // all-equal weeks (every shift 0 — earliest shift week must win),
    // tie-storm shifts, single-week types (must drop), random types
    val rnd = new scala.util.Random(178)
    val rows = scala.collection.mutable.ArrayBuffer[(Long, String, String, Double)]()
    def ts(week: Int, i: Int): String = {
      val d = java.time.LocalDate.of(2024, 1, 1).plusDays(week * 7L + i % 7)
      f"$d ${i % 24}%02d:00:00"
    }
    for (w <- 0 until 6; i <- 0 until 5)
      rows += ((rows.size.toLong, ts(w, i), "allequal", 5.00))
    rows += ((rows.size.toLong, ts(2, 0), "oneweek", 9.99))
    // ties: medians 1.00, 3.00, 1.00 → two shifts of 200 cents;
    // earliest (week 1) must win
    for ((w, v) <- Seq((0, 1.00), (1, 3.00), (2, 1.00)); i <- 0 until 3)
      rows += ((rows.size.toLong, ts(w, i), "ties", v))
    for (s <- 0 until 2; w <- 0 until 8; if rnd.nextInt(4) > 0;
         i <- 0 until (1 + rnd.nextInt(4)))
      rows += ((rows.size.toLong, ts(w, i), s"rand$s",
        rnd.nextInt(2000) / 100.0))
    val dir = java.nio.file.Files.createTempDirectory("graft_q178r").toString
    rows.toSeq.toDF("event_id", "tss", "event_type", "value")
      .withColumn("ts", to_timestamp_ntz($"tss"))
      .withColumn("user_id", $"event_id" % 7).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q178_median_drift")(spark, dir)
      .select($"event_type", $"n_weeks", $"max_shift_cents",
        datediff($"shift_week", lit("1970-01-01")).cast("long"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    Caching.release()
    assert(!got.contains("oneweek"), "single-week type must drop")
    rows.toSeq.groupBy(_._3).filter(_._1 != "oneweek").foreach { case (et, es) =>
      val byWeek = es.map { r =>
        val ed = java.time.LocalDate.parse(r._2.take(10)).toEpochDay
        (ed - java.lang.Math.floorMod(ed - 4L, 7L),
          math.rint(r._4 * 100).toLong)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      val weeks = byWeek.keys.toSeq.sorted
      def lowerMedian(v: Seq[Long]): Long =
        v.zipWithIndex.collectFirst {
          case (c, i) if (i + 1) * 2 >= v.size => c }.get
      val med = weeks.map(w => lowerMedian(byWeek(w)))
      val shifts = weeks.drop(1).zip(
        med.zip(med.drop(1)).map { case (p, c) => math.abs(c - p) })
      val best = shifts.maxBy { case (w, sh) => (sh, -w) }
      assert(got(et) == ((weeks.size.toLong, best._2, best._1)),
        s"$et: ${got(et)} vs (${weeks.size}, ${best._2}, ${best._1})")
    }
    assert(got("allequal")._2 == 0L, "all-equal weeks must shift 0")
    assert(got("ties")._2 == 200L)
  }

  test("q186 randomized: same-date order ties resolve by orderkey") {
    // customers whose first TWO orders share a date (the min-struct
    // flag must count exactly one of them as first), single-order
    // customers, and random histories
    val rnd = new scala.util.Random(186)
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Long, String, Double)]()
    def od(m: Int, d: Int): String = f"1995-${m + 1}%02d-${d + 1}%02d 00:00:00"
    for (c <- 0 until 5) { // same-date pair + one later order
      rows += ((rows.size.toLong, c.toLong, od(0, 3), 10.00))
      rows += ((rows.size.toLong, c.toLong, od(0, 3), 20.00))
      rows += ((rows.size.toLong, c.toLong, od(2, 7), 30.00))
    }
    for (c <- 5 until 9) rows += ((rows.size.toLong, c.toLong, od(1, c), 5.00))
    for (c <- 9 until 15; i <- 0 to rnd.nextInt(5))
      rows += ((rows.size.toLong, c.toLong,
        od(rnd.nextInt(12), rnd.nextInt(28)), rnd.nextInt(10000) / 100.0))
    val dir = java.nio.file.Files.createTempDirectory("graft_q186r").toString
    rows.toSeq.toDF("o_orderkey", "o_custkey", "ods", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp_ntz($"ods"))
      .withColumn("o_orderstatus", lit("F"))
      .withColumn("o_orderpriority", lit("3-MEDIUM"))
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q186_repeat_share")(spark, dir)
      .select($"month_index", $"n_orders", $"n_repeat")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    Caching.release()
    val os = rows.toSeq.map { r =>
      val ld = java.time.LocalDate.parse(r._3.take(10))
      (r._2, r._1, ld.toEpochDay, (ld.getYear - 1995) * 12 + ld.getMonthValue - 1) }
    val firstOf = os.groupBy(_._1).view
      .mapValues(_.map(o => (o._3, o._2)).min).toMap
    val want = os.map(o => (o._4.toLong, (o._3, o._2) != firstOf(o._1)))
      .groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.count(_._2).toLong)).toMap
    assert(got == want, s"$got vs $want")
    // month 0 holds the 5 same-date pairs: 10 orders, exactly 5 repeats
    assert(got(0L) == ((10L, 5L)), got(0L))
  }

  test("q190 segment top customers equal a driver-side rank walk") {
    val got = q("q190_segment_top_customers")
      .select($"c_mktsegment", $"rank", $"c_custkey", $"revenue_cents")
      .as[(String, Long, Long, Long)].collect().toSeq.sorted
    val seg = Tables.customer(spark, sf)
      .select($"c_custkey", $"c_mktsegment").as[(Long, String)]
      .collect().toMap
    val rev = Tables.orders(spark, sf)
      .select($"o_custkey", $"o_totalprice").as[(Long, Double)]
      .collect().toSeq.groupBy(_._1).view
      .mapValues(_.map(v => math.rint(v._2 * 100).toLong).sum).toMap
    val want = rev.toSeq.map { case (ck, rc) => (seg(ck), ck, rc) }
      .groupBy(_._1).toSeq.flatMap { case (sg, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(5).zipWithIndex
          .map { case ((_, ck, rc), i) => (sg, i + 1L, ck, rc) }
      }.sorted
    assert(got == want, s"$got vs $want")
  }

  private lazy val nationName: Map[Long, String] =
    Tables.nation(spark, sf)
      .select($"n_nationkey", $"n_name").as[(Long, String)].collect().toMap

  test("q191 nation revenue equals a driver-side dim-chain walk") {
    val got = q("q191_nation_revenue")
      .select($"r_name", $"n_name", $"n_customers", $"nation_cents",
        $"region_share")
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val regionOf = Tables.nation(spark, sf)
      .join(Tables.region(spark, sf),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name", $"r_name")
      .as[(Long, String, String)].collect()
      .map(n => n._1 -> ((n._2, n._3))).toMap
    val natOf = Tables.customer(spark, sf)
      .select($"c_custkey", $"c_nationkey").as[(Long, Long)]
      .collect().toMap
    val perCust = Tables.orders(spark, sf)
      .select($"o_custkey", $"o_totalprice").as[(Long, Double)]
      .collect().toSeq.groupBy(_._1).view
      .mapValues(_.map(v => math.rint(v._2 * 100).toLong).sum).toSeq
    val byNation = perCust.groupBy(p => regionOf(natOf(p._1))).view
      .mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    val regionTot = byNation.toSeq.groupBy(_._1._2).view
      .mapValues(_.map(_._2._2).sum).toMap
    assert(got.keySet == byNation.keySet.map { case (n, r) => (r, n) })
    byNation.foreach { case ((n, r), (nc, cents)) =>
      val g = got((r, n))
      assert((g._1, g._2) == ((nc, cents)), s"$n: $g")
      assert(math.abs(g._3 - cents.toDouble / regionTot(r)) < 5e-7, s"$n share")
    }
  }

  test("q192 size-price corr equals a driver-side exact-integer Pearson") {
    val got = q("q192_size_price_corr")
      .select($"p_brand", $"n_parts", $"size_price_corr").collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    val parts = Tables.part(spark, sf)
      .select($"p_brand", $"p_size".cast("long"), $"p_retailprice")
      .as[(String, Long, Double)].collect().toSeq
      .map(p => (p._1, p._2, math.rint(p._3 * 100).toLong))
    parts.groupBy(_._1).foreach { case (b, rows) =>
      val n = rows.size.toLong
      val sx = rows.map(_._2).sum; val sy = rows.map(_._3).sum
      val sxy = rows.map(r => r._2 * r._3).sum
      val sxx = rows.map(r => r._2 * r._2).sum
      val syy = rows.map(r => r._3 * r._3).sum
      val vx = n.toDouble * sxx - sx.toDouble * sx
      val vy = n.toDouble * syy - sy.toDouble * sy
      val (gn, gc) = got(b)
      assert(gn == n, s"$b n")
      if (n == 1 || vx == 0.0 || vy == 0.0) assert(gc.isEmpty, s"$b: $gc")
      else {
        val want = (n.toDouble * sxy - sx.toDouble * sy) / math.sqrt(vx * vy)
        assert(math.abs(gc.get - want) < 5e-7, s"$b: $gc vs $want")
      }
    }
  }

  test("q193 nation balance median equals a driver-side sorted pick") {
    val got = q("q193_nation_balance_median")
      .select($"n_name", $"n_customers", $"min_cents", $"median_cents",
        $"max_cents")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val custs = Tables.customer(spark, sf)
      .select($"c_nationkey", $"c_acctbal").as[(Long, Double)]
      .collect().toSeq
      .map(c => (nationName(c._1), math.rint(c._2 * 100).toLong))
    custs.groupBy(_._1).foreach { case (nn, rows) =>
      val sv = rows.map(_._2).sorted
      val med = sv.zipWithIndex.collectFirst {
        case (c, i) if (i + 1) * 2 >= sv.size => c }.get
      val want = (sv.size.toLong, sv.head, med, sv.last)
      assert(got(nn) == want, s"$nn: ${got(nn)} vs $want")
    }
  }

  test("q194 supplier nation revenue equals a driver-side chain walk") {
    val got = q("q194_supplier_nation_revenue")
      .select($"n_name", $"n_suppliers", $"nation_cents", $"global_share")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val natOf = Tables.supplier(spark, sf)
      .select($"s_suppkey", $"s_nationkey").as[(Long, Long)]
      .collect().toMap
    val perSupp = Tables.lineitem(spark, sf)
      .select($"l_suppkey", $"l_extendedprice").as[(Long, Double)]
      .collect().toSeq.groupBy(_._1).view
      .mapValues(_.map(v => math.rint(v._2 * 100).toLong).sum).toSeq
    val byNation = perSupp.groupBy(p => nationName(natOf(p._1))).view
      .mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    val total = byNation.values.map(_._2).sum
    assert(got.keySet == byNation.keySet)
    byNation.foreach { case (nn, (ns, cents)) =>
      val g = got(nn)
      assert((g._1, g._2) == ((ns, cents)), s"$nn: $g")
      assert(math.abs(g._3 - cents.toDouble / total) < 5e-7, s"$nn share")
    }
  }
}
