package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Repair/diff/resample semantics beyond the oracle hash: the invariants
  * that make each op safe to run blindly in a pipeline. */
class RepairSpec extends AnyFunSuite with SparkSpec {

  test("impute leaves no nulls and touches only the damaged rows") {
    import spark.implicits._
    val out = Repair.imputeQ(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n")
      val imputed = r.getAs[Long]("n_imputed")
      assert(imputed > 0 && imputed < n, "fixture must damage SOME rows")
      assert(!r.isNullAt(r.fieldIndex("sum_micro")),
        "repaired sum must be defined (no nulls survived)")
    }
  }

  test("winsorize preserves row counts, clips into [lo, hi], keeps interior values") {
    import spark.implicits._
    val ev = graft.Tables.t(spark, sfDir, "events")
    val before = ev.groupBy($"event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = Repair.winsorizeQ(spark, sfDir).collect()
    out.foreach { r =>
      val et = r.getAs[String]("event_type")
      assert(r.getAs[Long]("n") == before(et), "no rows created or lost")
      val clipped = r.getAs[Long]("n_clipped")
      // ~10% of rows sit outside exact p05/p95 by construction
      assert(clipped > 0 && clipped < before(et) / 2,
        s"$et clipped $clipped of ${before(et)} — outside plausible band")
      assert(r.getAs[Long]("v_lo_micro") <= r.getAs[Long]("v_hi_micro"))
    }
  }

  test("resample emits a complete grid; gaps only ever forward-fill") {
    import spark.implicits._
    val out = TimeSeries.resampleQ(spark, sfDir)
    val perSeries = out.groupBy($"event_type").count().collect()
    assert(perSeries.nonEmpty)
    perSeries.foreach(r => assert(r.getLong(1) == 720L,
      s"${r.getString(0)}: expected 720 hourly rows, got ${r.getLong(1)}"))
    // once a series has seen data, v_filled is never null again
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"hour")
    val bad = out
      .withColumn("seen", max(($"n_obs" > 0).cast("int")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .filter($"seen" === 1 && $"v_filled".isNull)
    assert(bad.isEmpty, "forward fill must cover every post-first-observation gap")
  }

  test("snapshot diff reconstructs exactly the planted edit script") {
    import spark.implicits._
    val out = Cdc.diffQ(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.nonEmpty)
    out.foreach {
      case (id, "added") => assert(id >= 1000000L, s"added id $id not from the shifted batch")
      case (id, "removed") => assert(id % 13 == 0, s"removed id $id not a %13 drop")
      case (id, "changed") => assert(id % 7 == 0 && id % 13 != 0, s"changed id $id not a %7 edit")
      case (id, st) => fail(s"unexpected status $st for $id")
    }
    // and the script is complete: every %13 key is reported removed
    val removed = out.collect { case (id, "removed") => id }.toSet
    val expected = graft.Tables.t(spark, sfDir, "events")
      .select($"user_id").distinct().filter($"user_id" % 13 === 0)
      .collect().map(_.getLong(0)).toSet
    assert(removed == expected)
  }

  test("ewma stays inside the raw band, smooths variance, equi-joins only") {
    import spark.implicits._
    val out = TimeSeries.ewmaQ(spark, sfDir)
    // the banded self-join must plan as an equi-join on (series, bucket),
    // never a nested-loop over the series
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"banded EWMA join degenerated to a non-equi join:\n$plan")
    val rows = out.collect()
    assert(rows.nonEmpty)
    val hourly = graft.Tables.t(spark, sfDir, "events")
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg((sum($"value".cast("decimal(18,6)")).cast("double") /
        count(lit(1))).as("v"))
      .filter($"event_type" <= "error")
    val (lo, hi) = {
      val r = hourly.agg(min($"v"), max($"v")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    rows.foreach { r =>
      val e = r.getAs[Double]("ewma")
      assert(e >= lo - 1e-6 && e <= hi + 1e-6,
        "a weighted mean cannot leave the band of its inputs")
    }
    // smoothing: per series, ewma variance strictly below raw variance
    val rawVar = hourly.groupBy($"event_type").agg(var_samp($"v").as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (et, rs) =>
      val xs = rs.map(_.getAs[Double]("ewma"))
      val m = xs.sum / xs.size
      val v = xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
      assert(v < rawVar(et),
        s"$et: ewma variance $v not below raw ${rawVar(et)}")
    }
  }

  test("MAD fences: med/mad positive, mild ⊇ extreme, extreme truly empty") {
    import spark.implicits._
    val out = Profile.madQ(spark, sfDir).collect()
    assert(out.length == 3)
    val li = graft.Tables.t(spark, sfDir, "lineitem")
    out.foreach { r =>
      val (med, mad) = (r.getAs[Double]("med"), r.getAs[Double]("mad"))
      assert(med > 0 && mad > 0)
      val mild = r.getAs[Long]("n_mild")
      val extreme = r.getAs[Long]("n_extreme")
      val n = r.getAs[Long]("n")
      assert(extreme <= mild && mild < n)
      // recount the mild fence independently from the raw table
      val flag = r.getAs[String]("l_returnflag")
      val recount = li.filter($"l_returnflag" === flag)
        .filter(abs($"l_extendedprice" - med) > lit(1.4826) * mad).count()
      assert(recount == mild, s"$flag: fence recount $recount != $mild")
    }
  }

  test("seasonal anomalies: |z| >= 2 and a flagged cell's z matches a raw recompute") {
    import spark.implicits._
    val rows = TimeSeries.seasonalQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("z")) >= 2.0)
      assert(r.getAs[Double]("mean_n") > 0.0)
    }
    // per-cell recompute for one flagged cell over the densified 30-day
    // sample of its (type, hour-of-day) slot
    val probe = rows.head
    val (et, h) = (probe.getAs[String]("event_type"), probe.getAs[Int]("h"))
    val sample = graft.Tables.t(spark, sfDir, "events")
      .filter($"event_type" === et && hour($"ts") === h)
      .groupBy(to_date($"ts").as("d")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[java.sql.Date]("d").toString -> r.getAs[Long]("n"))
      .toMap
    val all = (1 to 30).map(day =>
      sample.getOrElse(f"2024-01-$day%02d", 0L).toDouble)
    val m = all.sum / all.size
    val sd = math.sqrt(all.map(x => x * x).sum / all.size - m * m)
    val zExp = (probe.getAs[Long]("n_events") - m) / sd
    assert(math.abs(probe.getAs[Double]("z") - zExp) <= 1e-5,
      s"flagged-cell z ${probe.getAs[Double]("z")} vs recompute $zExp")
  }

  test("trend: one series' slope matches a raw daily-count recompute") {
    import spark.implicits._
    val rows = TimeSeries.trendQ(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach(r => assert(r.getAs[Double]("r2") >= 0.0 &&
      r.getAs[Double]("r2") <= 1.0))
    val probe = rows.head
    val et = probe.getAs[String]("event_type")
    val byDay = graft.Tables.t(spark, sfDir, "events")
      .filter($"event_type" === et)
      .groupBy(to_date($"ts").as("d")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[java.sql.Date]("d").toString -> r.getAs[Long]("n"))
      .toMap
    val xy = (1 to 30).map(day =>
      (day.toDouble, byDay.getOrElse(f"2024-01-$day%02d", 0L).toDouble))
    val m = xy.size.toDouble
    val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
    val sxy = xy.map(p => p._1 * p._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val expSlope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    assert(math.abs(probe.getAs[Double]("slope") - expSlope) <= 1e-5)
  }

  test("affinity: top pair's co-occurrence count matches a direct recount") {
    import spark.implicits._
    val rows = Affinity.pairsQ(spark, sfDir).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(r.getAs[String]("brand_a") < r.getAs[String]("brand_b"))
      assert(r.getAs[Long]("n_orders") >= 1L)
    }
    val top = rows.head
    val (ba, bb) = (top.getAs[String]("brand_a"), top.getAs[String]("brand_b"))
    val baskets = graft.Tables.t(spark, sfDir, "lineitem")
      .join(graft.Tables.t(spark, sfDir, "part"),
        $"l_partkey" === $"p_partkey")
      .select($"l_orderkey", $"p_brand").distinct()
    val recount = baskets.filter($"p_brand" === ba).select($"l_orderkey")
      .intersect(baskets.filter($"p_brand" === bb).select($"l_orderkey"))
      .count()
    assert(recount == top.getAs[Long]("n_orders"),
      s"($ba,$bb): recount $recount != ${top.getAs[Long]("n_orders")}")
  }

  test("wav: construct and parse both match the hand-computed golden header") {
    import spark.implicits._
    // mono, 8000 Hz, 16-bit PCM, 1024 samples — every byte written out
    // by hand from the RIFF spec, independent of leHexExpr/leValExpr
    val golden = ("52494646" + "24080000" + "57415645" + "666D7420" +
      "10000000" + "0100" + "0100" + "401F0000" + "803E0000" +
      "0200" + "1000" + "64617461" + "00080000")
    val built = Seq(1).toDF("x")
      .select(hex(Multimodal.wavHeader("1", "8000", "16", "1024")).as("h"))
      .collect().head.getString(0)
    assert(built == golden, s"construct drifted from golden:\n$built\n$golden")
    // a symmetric endianness bug in construct+parse would survive the
    // oracle round-trip; parsing the GOLDEN literal catches it
    val parsed = Seq(golden).toDF("g")
      .selectExpr("unhex(g) AS payload")
      .selectExpr("hex(payload) AS hx")
      .selectExpr(
        Multimodal.leValExpr("hx", 23, 2) + " AS ch",
        Multimodal.leValExpr("hx", 25, 4) + " AS rate",
        Multimodal.leValExpr("hx", 29, 4) + " AS byterate",
        Multimodal.leValExpr("hx", 33, 2) + " AS blockalign",
        Multimodal.leValExpr("hx", 35, 2) + " AS bits",
        Multimodal.leValExpr("hx", 41, 4) + " AS datasize")
      .collect().head
    assert(parsed.getLong(0) == 1L && parsed.getLong(1) == 8000L &&
      parsed.getLong(2) == 16000L && parsed.getLong(3) == 2L &&
      parsed.getLong(4) == 16L && parsed.getLong(5) == 2048L,
      s"parse drifted from golden: $parsed")
  }

  test("expfit: lambda and KS distance match a sequential recompute per type") {
    import spark.implicits._
    val rows = TimeSeries.expfitQ(spark, sfDir).collect()
    val ev = graft.Tables.t(spark, sfDir, "events")
      .select($"event_type", unix_micros($"ts"), $"event_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { r =>
      val t0 = r.getAs[String]("event_type")
      val ts = ev.filter(_._1 == t0).sortBy(e => (e._2, e._3)).map(_._2)
      val gaps = ts.zip(ts.tail).map { case (a, b) => b - a }
      assert(r.getAs[Long]("n_gaps") == gaps.length.toLong)
      val mean = gaps.sum / gaps.length
      assert(r.getAs[Long]("mean_gap_us") == mean)
      val lam = gaps.length.toDouble / gaps.sum
      assert(math.abs(r.getAs[Double]("rate_per_hour") - lam * 3.6e9) < 1e-3)
      // sequential KS over the sorted distinct support
      val byG = gaps.groupBy(identity).view.mapValues(_.length).toMap
      var cum = 0L
      val n = gaps.length.toDouble
      val d = byG.keys.toSeq.sorted.map { g =>
        val c = byG(g); cum += c
        val fe = 1.0 - math.exp(-lam * g)
        math.max(math.abs(cum / n - fe), math.abs((cum - c) / n - fe))
      }.max
      assert(math.abs(r.getAs[Double]("ks_d") - d) < 1e-5,
        s"$t0: ${r.getAs[Double]("ks_d")} vs $d")
      assert(r.getAs[Double]("ks_d") >= 0 && r.getAs[Double]("ks_d") <= 1)
    }
  }

  test("dp hist: noise equals the seeded inverse-CDF draw and release is clamped floor") {
    import spark.implicits._
    val rows = Pii.dpHistQ(spark, sfDir).collect()
    val truth = graft.Tables.t(spark, sfDir, "documents")
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      assert(r.getAs[Long]("n_true") == truth(lang))
      val hex = md.digest(s"dp:$lang".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val u = (java.lang.Long.parseLong(hex, 16) % 1000000 + 0.5) / 1000000.0
      val lap = if (u < 0.5) 1.0 * math.log(u * 2.0)
                else -1.0 * math.log((1.0 - u) * 2.0)
      assert(math.abs(r.getAs[Double]("noise") - lap) < 1e-5, s"$lang noise")
      val released = math.max(0L, math.floor(truth(lang) + lap).toLong)
      assert(r.getAs[Long]("n_released") == released)
      assert(r.getAs[Double]("epsilon") == 1.0)
    }
  }

  test("trimmed mean: interior average matches a driver-side sort-and-drop recompute") {
    import spark.implicits._
    val rows = Profile.trimmedMeanQ(spark, sfDir).collect()
    val ev = graft.Tables.t(spark, sfDir, "events")
      .select($"event_type",
        ($"value".cast("decimal(18,6)") * 1000000).cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    rows.foreach { r =>
      val t0 = r.getAs[String]("event_type")
      val vs = ev.filter(_._1 == t0).map(_._2).sorted
      val n = vs.length
      val k = (5 * n + 99) / 100
      assert(r.getAs[Long]("n") == n.toLong)
      assert(r.getAs[Long]("n_dropped") == 2L * k)
      assert(r.getAs[Long]("mean_micro") == vs.sum / n)
      val interior = vs.slice(k, n - k)
      assert(r.getAs[Long]("trimmed_mean_micro") ==
        interior.sum / interior.length,
        s"$t0: ${r.getAs[Long]("trimmed_mean_micro")} vs ${interior.sum / interior.length}")
    }
  }

  test("weighted median: matches a driver-side cumulative-weight scan") {
    import spark.implicits._
    val rows = Profile.weightedMedianQ(spark, sfDir).collect()
    val li = graft.Tables.t(spark, sfDir, "lineitem")
      .select($"l_returnflag", $"l_extendedprice".cast("double"),
        $"l_quantity".cast("long")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    rows.foreach { r =>
      val g = r.getAs[String]("g")
      val grp = li.filter(_._1 == g).sortBy(_._2)
      val tw = grp.map(_._3).sum
      assert(r.getAs[Long]("total_weight") == tw)
      var cum = 0L
      val med = grp.find { e => cum += e._3; cum * 2 >= tw }.get._2
      assert(r.getAs[Double]("w_median") == med,
        s"$g: ${r.getAs[Double]("w_median")} vs $med")
    }
  }

  test("qnorm: decile selections are exact order statistics and shifts reconcile") {
    import spark.implicits._
    val rows = Repair.qnormQ(spark, sfDir).collect()
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select($"source", $"n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val pooledSorted = docs.map(_._2).sorted
    val n = pooledSorted.length
    rows.foreach { r =>
      val (src, d) = (r.getAs[String]("source"), r.getAs[Int]("decile"))
      val srcSorted = docs.filter(_._1 == src).map(_._2).sorted
      val m = srcSorted.length
      val expSrc = srcSorted((d * m + 9) / 10 - 1)
      val expPool = pooledSorted((d * n + 9) / 10 - 1)
      assert(r.getAs[Long]("src_val") == expSrc, s"$src d$d src")
      assert(r.getAs[Long]("pooled_val") == expPool, s"$src d$d pooled")
      assert(r.getAs[Long]("shift") == expPool - expSrc)
    }
    // 9 deciles per source, monotone within each source
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      assert(rs.length == 9)
      val vs = rs.sortBy(_.getAs[Int]("decile")).map(_.getAs[Long]("src_val"))
      assert(vs.zip(vs.tail).forall { case (a, b) => a <= b })
    }
  }

  test("interpolate: fills exactly the planted nulls, interp values sit on the neighbor line") {
    import spark.implicits._
    val rows = Repair.interpolateQ(spark, sfDir).collect()
    val events = graft.Tables.t(spark, sfDir, "events")
      .select($"user_id", $"event_id", $"ts", $"value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime * 1000, r.getDouble(3)))
    val planted = events.count(_._2 % 10 == 0)
    assert(rows.length == planted, s"${rows.length} filled vs $planted planted")
    // sequential per-user recompute of the three fill modes
    val byUser = events.groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._3, e._2))).toMap
    val got = rows.map(r => r.getAs[Long]("event_id") ->
      (r.getAs[String]("method"), r.getAs[Double]("v_filled"))).toMap
    byUser.values.foreach { seq =>
      seq.zipWithIndex.filter(_._1._2 % 10 == 0).foreach { case (e, i) =>
        val prev = seq.take(i).filter(_._2 % 10 != 0).lastOption
        val next = seq.drop(i + 1).filter(_._2 % 10 != 0).headOption
        val (method, v) = got(e._2)
        (prev, next) match {
          case (Some(p), Some(nx)) =>
            assert(method == "interp")
            val expect = p._4 + (nx._4 - p._4) *
              ((e._3.toDouble - p._3) / (nx._3 - p._3))
            assert(math.abs(v - expect) < 1e-5, s"event ${e._2}: $v vs $expect")
            // betweenness: a linear fill never overshoots its anchors
            assert(v >= math.min(p._4, nx._4) - 1e-6 &&
              v <= math.max(p._4, nx._4) + 1e-6)
          case (Some(p), None) =>
            assert(method == "ffill" && math.abs(v - p._4) < 1e-6)
          case (None, Some(nx)) =>
            assert(method == "bfill" && math.abs(v - nx._4) < 1e-6)
          case _ => fail(s"event ${e._2}: no anchors at all")
        }
      }
    }
  }

  test("affinity cosine: score equals co/sqrt(na*nb) and popularity-corrects the raw count") {
    import spark.implicits._
    val rows = Affinity.cosineQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // recount the two marginals and the co-occurrence for the top pair
    val baskets = graft.Tables.t(spark, sfDir, "lineitem")
      .join(graft.Tables.t(spark, sfDir, "part"),
        $"l_partkey" === $"p_partkey")
      .select($"l_orderkey", $"p_brand").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byBrand = baskets.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("brand_a"), r.getAs[String]("brand_b"))
      assert(a < b)
      assert(r.getAs[Long]("n_a") == byBrand(a))
      assert(r.getAs[Long]("n_b") == byBrand(b))
      val orders = baskets.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      val co = orders.values.count(s => s.contains(a) && s.contains(b)).toLong
      assert(r.getAs[Long]("co") == co)
      val c = r.getAs[Double]("cosine")
      assert(c > 0.0 && c <= 1.0)
      assert(math.abs(c - co / math.sqrt(
        byBrand(a).toDouble * byBrand(b))) < 1e-5)
    }
  }

  test("decompose: grid-exact hour count, variance ordering, strength matches a driver recompute") {
    import spark.implicits._
    val rows = TimeSeries.decomposeQ(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hours") == 720L - 24L) // 30 days minus MA edges
      val (vd, vr) = (r.getAs[Double]("var_detrended"), r.getAs[Double]("var_resid"))
      val st = r.getAs[Double]("seasonal_strength")
      assert(vr >= 0 && vd > 0)
      assert(st >= 0.0 && st <= 1.0)
      assert(math.abs(st - math.max(0.0, 1.0 - vr / vd)) < 2e-6)
    }
    // full recompute for one series from the raw events
    val t0 = rows.head.getAs[String]("event_type")
    val counts = graft.Tables.t(spark, sfDir, "events")
      .filter($"event_type" === t0)
      .groupBy(date_trunc("hour", $"ts").as("hr"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
    val start = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val series = (0 until 720).map(i => counts.getOrElse(start + i * 3600000L, 0L))
    val trend = (12 until 708).map(i =>
      (i - 12 to i + 12).map(series).sum.toDouble / 25.0)
    val detr = (12 until 708).map(i => series(i) - trend(i - 12))
    val hod = (12 until 708).map(_ % 24)
    val seas = hod.zip(detr).groupBy(_._1).view.mapValues { xs =>
      val s = xs.map(p => BigDecimal(p._2).setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum
      BigDecimal(s.toDouble / xs.length).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val resid = hod.zip(detr).map { case (h, x) => x - seas(h) }
    def variance(xs: Seq[Double]): Double = {
      def ds(vs: Seq[Double]) = vs.map(v =>
        BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      val m = xs.length
      ds(xs.map(x => x * x)) / m - (ds(xs) / m) * (ds(xs) / m)
    }
    val got = rows.find(_.getAs[String]("event_type") == t0).get
    assert(math.abs(got.getAs[Double]("var_detrended") - variance(detr)) < 1e-4,
      s"${got.getAs[Double]("var_detrended")} vs ${variance(detr)}")
    assert(math.abs(got.getAs[Double]("var_resid") - variance(resid)) < 1e-4)
  }

  test("hampel: per-row median/MAD replay; planted nonzero spikes all flag; clean rows pass through") {
    import spark.implicits._
    val rows = Repair.hampelQ(spark, sfDir).collect()
    assert(rows.length == 150) // 30 days x 5 types, dense
    // driver replay of the spiked dense series
    val raw = graft.Tables.t(spark, sfDir, "events")
      .select($"event_type", date_trunc("day", $"ts").as("d")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val start = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val day = 86400000L
    val spikeIdx = Set(9, 21) // 2024-01-10 and 2024-01-22
    val types = raw.keySet.map(_._1)
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    var flaggedTotal = 0
    types.foreach { tp =>
      val xs = (0 until 30).map { i =>
        val base = raw.getOrElse((tp, start + i * day), 0L)
        if (spikeIdx(i)) base * 10 else base
      }
      (0 until 30).foreach { i =>
        val win = (math.max(0, i - 3) to math.min(29, i + 3)).map(j => xs(j).toDouble)
        val m = med(win)
        val mad = med(win.map(x => math.abs(x - m)))
        val flagged = math.abs(xs(i) - m) > 3.0 * 1.4826 * mad
        val got = rows.find(r => r.getAs[String]("event_type") == tp &&
          r.getAs[java.sql.Timestamp]("d").getTime == start + i * day).get
        assert(got.getAs[Long]("x") == xs(i))
        assert(math.abs(got.getAs[Double]("med") - m) < 1e-9)
        assert(math.abs(got.getAs[Double]("mad") - mad) < 1e-9)
        assert(got.getAs[Int]("flagged") == (if (flagged) 1 else 0))
        val expRepaired = if (flagged) m else xs(i).toDouble
        assert(math.abs(got.getAs[Double]("repaired") - expRepaired) < 1e-9)
        if (flagged) flaggedTotal += 1
        // a planted spike an order of magnitude above its window median
        // must flag whenever the day had any traffic
        if (spikeIdx(i) && raw.getOrElse((tp, start + i * day), 0L) > 0 &&
            mad > 0) assert(flagged, s"$tp day $i spike unflagged")
      }
    }
    assert(flaggedTotal >= 2, "at least the planted spikes flag")
  }
}
