package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class StatsSpec extends AnyFunSuite with SparkSpec {

  test("chi2: conserves n, dof from table shape, statistic matches a driver recompute") {
    import spark.implicits._
    val r = Stats.chi2Q(spark, sfDir).collect().head
    val docs = graft.Tables.t(spark, sfDir, "documents")
    assert(r.getAs[Long]("n") == docs.count())
    assert(r.getAs[Long]("dof") ==
      (r.getAs[Long]("n_langs") - 1) * (r.getAs[Long]("n_sources") - 1))
    val cells = docs.groupBy($"lang", $"source").count().collect()
      .map(x => ((x.getString(0), x.getString(1)), x.getLong(2))).toMap
    val rowT = cells.groupBy(_._1._1).view.mapValues(_.values.sum)
    val colT = cells.groupBy(_._1._2).view.mapValues(_.values.sum)
    val n = cells.values.sum.toDouble
    val chi2 = cells.map { case ((l, s), o) =>
      val e = rowT(l) * colT(s).toDouble / n
      val t = (o - e) * (o - e) / e
      BigDecimal(t).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-5,
      s"query ${r.getAs[Double]("chi2")} vs recompute $chi2")
  }

  test("benford: digits 1-9, shares normalize, expectation is the log law") {
    val rows = Stats.benfordQ(spark, sfDir).collect()
    val digits = rows.map(_.getAs[Int]("d"))
    assert(digits.toSet.subsetOf((1 to 9).toSet))
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    rows.foreach { r =>
      val d = r.getAs[Int]("d")
      assert(math.abs(r.getAs[Double]("benford") -
        math.log10(1 + 1.0 / d)) < 1e-6)
      assert(math.abs(r.getAs[Double]("deviation") -
        (r.getAs[Double]("share") - r.getAs[Double]("benford"))) < 1e-6)
    }
    // Benford expectations themselves normalize over 1..9
    assert(math.abs((1 to 9).map(d => math.log10(1 + 1.0 / d)).sum - 1.0)
      < 1e-9)
  }

  test("acf: bounded, present per (type, lag), lag-1 matches a driver recompute") {
    import spark.implicits._
    val rows = Stats.acfQ(spark, sfDir).collect()
    val types = graft.Tables.t(spark, sfDir, "events")
      .select($"event_type").distinct().count()
    assert(rows.length == 2 * types)
    rows.foreach(r => assert(math.abs(r.getAs[Double]("acf")) <= 1.0))
    // recompute lag-1 ACF for one series from the densified hourly grid
    val t0 = rows.head.getAs[String]("event_type")
    val hourly = graft.Tables.t(spark, sfDir, "events")
      .filter($"event_type" === t0)
      .groupBy(org.apache.spark.sql.functions.date_trunc("hour", $"ts")
        .as("hour"))
      .count().collect()
      .map(x => (x.getTimestamp(0).getTime, x.getLong(1))).toMap
    val start = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val hours = (0 until 30 * 24)
      .map(i => hourly.getOrElse(start + i * 3600000L, 0L))
    val x = hours.dropRight(1).map(_.toDouble)
    val y = hours.drop(1).map(_.toDouble)
    val n = x.length
    val (sx, sy) = (x.sum, y.sum)
    val sxx = x.map(v => v * v).sum
    val syy = y.map(v => v * v).sum
    val sxy = x.zip(y).map { case (a, b) => a * b }.sum
    val acf = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    val got = rows.find(r => r.getAs[String]("event_type") == t0 &&
      r.getAs[Int]("lag") == 1).get.getAs[Double]("acf")
    assert(math.abs(got - acf) < 1e-5, s"query $got vs recompute $acf")
  }

  test("mann-whitney: U identities hold and match a naive per-row rank recompute") {
    import spark.implicits._
    val r = Stats.mannWhitneyQ(spark, sfDir).collect().head
    val (n1, n2) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"))
    val (u1, u2, z) = (r.getAs[Double]("u1"), r.getAs[Double]("u2"),
      r.getAs[Double]("z"))
    val vals = graft.Tables.t(spark, sfDir, "events")
      .filter($"event_type".isin("click", "view"))
      .select($"event_type", $"value").collect()
      .map(x => (x.getString(0), x.getDouble(1)))
    assert(n1 == vals.count(_._1 == "click") && n2 == vals.count(_._1 == "view"))
    // naive tie-averaged ranks over the pooled sample
    val sorted = vals.map(_._2).sorted
    val avgRank = sorted.zipWithIndex.groupBy(_._1).view.mapValues(g =>
      g.map(_._2 + 1).sum.toDouble / g.size).toMap
    val r1 = vals.collect { case ("click", v) => avgRank(v) }.sum
    val expU1 = r1 - n1 * (n1 + 1) / 2.0
    assert(math.abs(u1 - expU1) < 1e-6, s"u1 $u1 vs $expU1")
    assert(math.abs(u1 + u2 - n1.toDouble * n2) < 1e-6, "U1 + U2 must equal n1*n2")
    val expZ = (expU1 - n1.toDouble * n2 / 2) /
      math.sqrt(n1.toDouble * n2 * (n1 + n2 + 1) / 12)
    assert(math.abs(z - expZ) < 1e-5, s"z $z vs $expZ")
  }

  test("bootstrap: replicate means match a driver recompute and bracket the mean plausibly") {
    import spark.implicits._
    val r = Stats.bootstrapQ(spark, sfDir).collect().head
    val (n, mean, lo, hi) = (r.getAs[Long]("n"), r.getAs[Double]("mean_value"),
      r.getAs[Double]("boot_lo"), r.getAs[Double]("boot_hi"))
    assert(lo < mean && mean < hi, "CI must bracket the mean")
    val rows = graft.Tables.t(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_totalprice").collect()
      .map(x => (x.getLong(0), BigDecimal(x.getDouble(1))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    assert(n == rows.length)
    def member(i: Long, b: Int): Boolean =
      ((((i * 32 + b) * 2654435761L) % 4294967296L) / 65536) % 2 == 1
    val reps = (0 until 32).map { b =>
      val sel = rows.filter { case (i, _) => member(i, b) }
      sel.map(_._2).sum.toDouble / sel.size
    }.sorted
    assert(math.abs(lo - reps(1)) < 1e-5, s"lo $lo vs ${reps(1)}")
    assert(math.abs(hi - reps(30)) < 1e-5, s"hi $hi vs ${reps(30)}")
    // half-sample bootstrap width ~ 2 z sd/sqrt(n/2); allow a wide band
    val xs = rows.map(_._2.toDouble)
    val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (n - 1))
    val se = sd / math.sqrt(n / 2.0)
    assert(hi - lo > se && hi - lo < 8 * se, s"CI width ${hi - lo} vs se $se")
  }

  test("mi: information identities hold and the statistic matches a driver recompute") {
    import spark.implicits._
    val r = Stats.miQ(spark, sfDir).collect().head
    val (mi, hl, hs, nmi) = (r.getAs[Double]("mi_nats"), r.getAs[Double]("h_lang"),
      r.getAs[Double]("h_source"), r.getAs[Double]("nmi"))
    assert(mi >= 0 && mi <= math.min(hl, hs) + 1e-9, "0 <= MI <= min entropy")
    assert(math.abs(nmi - mi / math.min(hl, hs)) < 1e-5)
    val cells = graft.Tables.t(spark, sfDir, "documents")
      .groupBy($"lang", $"source").count().collect()
      .map(x => ((x.getString(0), x.getString(1)), x.getLong(2))).toMap
    val n = cells.values.sum.toDouble
    val pr = cells.groupBy(_._1._1).view.mapValues(_.values.sum / n)
    val pc = cells.groupBy(_._1._2).view.mapValues(_.values.sum / n)
    val expMi = cells.map { case ((l, s0), o) =>
      val p = o / n
      BigDecimal(p * math.log(p / (pr(l) * pc(s0))))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    assert(math.abs(mi - expMi) < 1e-5, s"mi $mi vs $expMi")
    def ent(ps: Iterable[Double]) = ps.map(p =>
      BigDecimal(-p * math.log(p)).setScale(9, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble
    assert(math.abs(hl - ent(pr.values)) < 1e-5)
    assert(math.abs(hs - ent(pc.values)) < 1e-5)
  }

  test("ab lift: cohorts partition users, z matches the pooled-SE formula") {
    import spark.implicits._
    val r = Stats.abLiftQ(spark, sfDir).collect().head
    val (na, ca, nb, cb) = (r.getAs[Long]("n_a"), r.getAs[Long]("conv_a"),
      r.getAs[Long]("n_b"), r.getAs[Long]("conv_b"))
    val users = graft.Tables.t(spark, sfDir, "events")
      .groupBy($"user_id")
      .agg(sum(($"event_type" === "purchase").cast("long")).as("np"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(na + nb == users.length, "cohorts partition the user base")
    assert(ca == users.count { case (u, np) => u % 2 == 0 && np >= 14 })
    assert(cb == users.count { case (u, np) => u % 2 == 1 && np >= 14 })
    val (ra, rb) = (ca.toDouble / na, cb.toDouble / nb)
    val p = (ca + cb).toDouble / (na + nb)
    val z = (rb - ra) / math.sqrt(p * (1 - p) * (1.0 / na + 1.0 / nb))
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-5)
    assert(math.abs(r.getAs[Double]("lift") - (rb - ra)) < 1e-5)
  }

  test("cusum: peak matches an exact integer scan of the dense hourly series") {
    import spark.implicits._
    val rows = TimeSeries.cusumQ(spark, sfDir).collect()
    val counts = graft.Tables.t(spark, sfDir, "events")
      .groupBy($"event_type", date_trunc("hour", $"ts").as("hour"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => ((r.getString(0), r.getTimestamp(1).getTime), r.getLong(2)))
      .toMap
    val hours = (0 until 720).map(h =>
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + h * 3600000L)
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val xs = hours.map(h => counts.getOrElse((et, h), 0L))
      val tot = xs.sum
      assert(r.getAs[Long]("n_hours") == 720 && r.getAs[Long]("total") == tot)
      // exact integer deviation scan, earliest hour wins ties
      val devs = xs.scanLeft(0L)(_ + _).tail.zipWithIndex.map {
        case (cum, i0) => (720L * cum - (i0 + 1) * tot, i0) }
      val (bestDev, bestI) = devs.minBy { case (d, i) => (-math.abs(d), i) }
      val expPeak = new java.sql.Timestamp(hours(bestI))
      assert(r.getAs[java.sql.Timestamp]("peak_hour") == expPeak,
        s"$et peak hour")
      assert(math.abs(r.getAs[Double]("cusum_peak") - bestDev.toDouble / 720) < 1e-6)
    }
  }

  test("spearman: centered-rank invariants hold and rho matches a naive per-row rank recompute") {
    import spark.implicits._
    val rows = Stats.spearmanQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val groups = graft.Tables.t(spark, sfDir, "lineitem")
      .groupBy($"l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val g = r.getAs[String]("g")
      assert(r.getAs[Long]("n") == groups(g))
      assert(r.getAs[Long]("s_xx") > 0 && r.getAs[Long]("s_yy") > 0)
      assert(math.abs(r.getAs[Double]("rho")) <= 1.0)
    }
    // naive recompute for one group: average ranks, Pearson over them
    val g0 = rows.head.getAs[String]("g")
    val xy = graft.Tables.t(spark, sfDir, "lineitem")
      .filter($"l_returnflag" === g0)
      .select($"l_quantity", $"l_discount").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    def avgRanks(v: Array[Double]): Array[Double] = {
      val sorted = v.zipWithIndex.sortBy(_._1)
      val out = new Array[Double](v.length)
      var i = 0
      while (i < sorted.length) {
        var j = i
        while (j + 1 < sorted.length && sorted(j + 1)._1 == sorted(i)._1) j += 1
        val rank = (i + j + 2) / 2.0 // average of 1-based ranks i+1..j+1
        (i to j).foreach(k => out(sorted(k)._2) = rank)
        i = j + 1
      }
      out
    }
    val rx = avgRanks(xy.map(_._1)); val ry = avgRanks(xy.map(_._2))
    val n = rx.length
    val mx = rx.sum / n; val my = ry.sum / n
    val sxy = rx.indices.map(i => (rx(i) - mx) * (ry(i) - my)).sum
    val sxx = rx.map(v => (v - mx) * (v - mx)).sum
    val syy = ry.map(v => (v - my) * (v - my)).sum
    val expected = sxy / math.sqrt(sxx) / math.sqrt(syy)
    val got = rows.find(_.getAs[String]("g") == g0).get.getAs[Double]("rho")
    assert(math.abs(got - expected) < 1e-5, s"rho $got vs naive $expected")
  }

  test("welch t: matches a naive two-pass recompute; df between min(n)-1 and n1+n2-2") {
    import spark.implicits._
    val r = Stats.ttestQ(spark, sfDir).collect().head
    val Array(xs, ys) = Array("click", "view").map { tp =>
      graft.Tables.t(spark, sfDir, "events")
        .filter($"event_type" === tp).select($"value")
        .collect().map(_.getDouble(0))
    }
    def mv(a: Array[Double]): (Double, Double) = {
      val m = a.sum / a.length
      (m, a.map(v => (v - m) * (v - m)).sum / (a.length - 1))
    }
    val (m1, v1) = mv(xs); val (m2, v2) = mv(ys)
    val se2 = v1 / xs.length + v2 / ys.length
    val tExp = (m1 - m2) / math.sqrt(se2)
    val dfExp = se2 * se2 /
      (math.pow(v1 / xs.length, 2) / (xs.length - 1)
        + math.pow(v2 / ys.length, 2) / (ys.length - 1))
    assert(r.getAs[Long]("n1") == xs.length && r.getAs[Long]("n2") == ys.length)
    assert(math.abs(r.getAs[Double]("t_welch") - tExp) < 1e-4)
    assert(math.abs(r.getAs[Double]("df_welch") - dfExp) < 1.0)
    val lo = math.min(xs.length, ys.length) - 1.0
    val hi = xs.length + ys.length - 2.0
    assert(r.getAs[Double]("df_welch") >= lo && r.getAs[Double]("df_welch") <= hi)
  }

  test("period: correlogram argmax matches a driver ACF sweep over lags 2..36") {
    import spark.implicits._
    val rows = Stats.periodQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val hourly = graft.Tables.t(spark, sfDir, "events")
      .groupBy($"event_type", date_trunc("hour", $"ts").as("hour")).count()
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
      .groupBy(_._1)
    val gridStart = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    rows.foreach { r =>
      val ty = r.getAs[String]("event_type")
      val byHour = hourly(ty).map(e => e._2 -> e._3).toMap
      val xs = (0 until 30 * 24).map { h =>
        byHour.getOrElse(new java.sql.Timestamp(
          gridStart.getTime + h * 3600L * 1000), 0L)
      }.toArray
      def acfAt(k: Int): Double = {
        val pairs = xs.dropRight(k).zip(xs.drop(k))
        val n = pairs.length.toLong
        val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
        val sxx = pairs.map(p => p._1 * p._1).sum
        val syy = pairs.map(p => p._2 * p._2).sum
        val sxy = pairs.map(p => p._1 * p._2).sum
        val v = (n * sxy - sx * sy).toDouble /
          math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
        BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val sweep = (2 to 36).map(k => k -> acfAt(k))
      val best = sweep.minBy { case (k, a) => (-a, k) }
      assert(r.getAs[Long]("best_lag") == best._1, s"$ty best lag")
      assert(math.abs(r.getAs[Double]("best_acf") - best._2) < 1e-6)
      assert(math.abs(r.getAs[Double]("acf_at_24") - acfAt(24)) < 1e-6)
    }
  }

  test("levene (brown-forsythe): W matches a driver recompute over |x - group lower median|") {
    import spark.implicits._
    val r = Stats.leveneQ(spark, sfDir).collect().head
    val all = graft.Tables.t(spark, sfDir, "events")
      .select($"event_type", $"value").collect()
      .map(x => (x.getString(0), BigDecimal(x.getDouble(1))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val groups = all.groupBy(_._1)
    // lower median = the ceil(n/2)-th ordered value, exactly as the query
    val med = groups.map { case (tp, g) =>
      val sorted = g.map(_._2).sorted
      tp -> sorted((sorted.length + 1) / 2 - 1)
    }
    med.foreach { case (tp, m) =>
      assert(r.getAs[Double](s"med_$tp") == m.toDouble, s"median $tp") }
    val z = all.map { case (tp, x) => (tp, (x - med(tp)).abs) }
    val n = z.length
    val zAll = z.map(_._2).sum
    val gm = zAll.toDouble / n
    val zg = z.groupBy(_._1)
    val ssb = zg.values.map { g =>
      val m = g.map(_._2).sum.toDouble / g.length
      g.length * (m - gm) * (m - gm) }.sum
    val ssw = zg.values.map { g =>
      val m = g.map(_._2).sum.toDouble / g.length
      g.map(x => (x._2.toDouble - m) * (x._2.toDouble - m)).sum }.sum
    assert(r.getAs[Long]("n") == n && r.getAs[Long]("k") == zg.size)
    assert(math.abs(r.getAs[Double]("ss_between") - ssb) < 1e-3 * (1 + ssb))
    assert(math.abs(r.getAs[Double]("ss_within") - ssw) < 1e-3 * (1 + ssw))
    val wExp = (ssb / (zg.size - 1)) / (ssw / (n - zg.size))
    assert(math.abs(r.getAs[Double]("w_stat") - wExp) < 1e-4 * (1 + wExp))
  }

  test("anova: sum-of-squares decomposition equals total SS and F matches a recompute") {
    import spark.implicits._
    val r = Stats.anovaQ(spark, sfDir).collect().head
    val all = graft.Tables.t(spark, sfDir, "events")
      .select($"event_type", $"value").collect()
      .map(x => (x.getString(0), x.getDouble(1)))
    val n = all.length
    val gm = all.map(_._2).sum / n
    val sst = all.map(x => (x._2 - gm) * (x._2 - gm)).sum
    val groups = all.groupBy(_._1).values.toSeq
    val ssb = groups.map { g =>
      val m = g.map(_._2).sum / g.length; g.length * (m - gm) * (m - gm)
    }.sum
    val ssw = groups.map { g =>
      val m = g.map(_._2).sum / g.length
      g.map(x => (x._2 - m) * (x._2 - m)).sum
    }.sum
    assert(r.getAs[Long]("n") == n && r.getAs[Long]("k") == groups.size)
    assert(math.abs(r.getAs[Double]("ss_between") - ssb) < 1e-3 * (1 + ssb))
    assert(math.abs(r.getAs[Double]("ss_within") - ssw) < 1e-3 * (1 + ssw))
    // decomposition identity against the recompute
    assert(math.abs((ssb + ssw) - sst) < 1e-3 * (1 + sst))
    val fExp = (ssb / (groups.size - 1)) / (ssw / (n - groups.size))
    assert(math.abs(r.getAs[Double]("f_stat") - fExp) < 1e-4 * (1 + fExp))
  }

  test("neyman: allocations sum to the budget and stay within 1 of the real-valued optimum") {
    import spark.implicits._
    val rows = Stats.neymanQ(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("alloc")).sum == 1000L)
    // recompute the real-valued optimum from the data
    val stats = graft.Tables.t(spark, sfDir, "customer")
      .select($"c_mktsegment", $"c_acctbal").collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
    val w = stats.view.mapValues { xs =>
      val v = xs.map(_._2); val m = v.map(_ / v.length).sum * 1.0
      val mean = v.sum / v.length
      val sd = math.sqrt(v.map(x => (x - mean) * (x - mean)).sum / (v.length - 1))
      v.length * sd
    }.toMap
    val wtot = w.values.sum
    rows.foreach { r =>
      val ideal = 1000.0 * w(r.getAs[String]("stratum")) / wtot
      val alloc = r.getAs[Long]("alloc").toDouble
      assert(math.abs(alloc - ideal) < 1.0 + 1e-6,
        s"${r.getAs[String]("stratum")}: $alloc vs ideal $ideal")
    }
  }

  test("wilson: interval brackets the rate, narrows with n, matches the textbook formula") {
    val rows = Stats.wilsonQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n"); val k = r.getAs[Long]("k")
      val p = k.toDouble / n
      val lo = r.getAs[Double]("wilson_lo"); val hi = r.getAs[Double]("wilson_hi")
      assert(lo <= p && p <= hi, s"${r.getAs[String]("event_type")}")
      assert(lo >= 0.0 && hi <= 1.0)
      val z = 1.96; val zz = z * z
      val den = 1.0 + zz / n
      val c = (p + zz / (2.0 * n)) / den
      val h = z * math.sqrt(p * (1 - p) / n + zz / (4.0 * n * n)) / den
      assert(math.abs(lo - (c - h)) < 1e-5)
      assert(math.abs(hi - (c + h)) < 1e-5)
      assert(r.getAs[Long]("rate_bp") == 10000L * k / n)
    }
  }

  test("cramers: V in [0,1] and matches sqrt(chi2/(n*min(r-1,c-1)))") {
    val v = Stats.cramersQ(spark, sfDir).collect().head
    val c = Stats.chi2Q(spark, sfDir).collect().head
    assert(v.getAs[Double]("chi2") == c.getAs[Double]("chi2"))
    val expect = math.sqrt(c.getAs[Double]("chi2") /
      (c.getAs[Long]("n").toDouble *
        math.min(c.getAs[Long]("n_langs") - 1, c.getAs[Long]("n_sources") - 1)))
    val got = v.getAs[Double]("cramers_v")
    assert(got >= 0.0 && got <= 1.0)
    assert(math.abs(got - expect) < 1e-5, s"query $got vs recompute $expect")
  }

  test("kendall: counts and tau-b match a naive all-pairs recompute") {
    import spark.implicits._
    val r = Stats.kendallQ(spark, sfDir).collect().head
    val xy = graft.Tables.t(spark, sfDir, "lineitem")
      .select($"l_quantity".cast("double"), $"l_discount".cast("double"))
      .collect().map(w => (w.getDouble(0), w.getDouble(1)))
    var conc = 0L; var disc = 0L; var tx = 0L; var ty = 0L
    for (i <- xy.indices; j <- (i + 1) until xy.length) {
      val ((xa, ya), (xb, yb)) = (xy(i), xy(j))
      if (xa == xb) tx += 1
      if (ya == yb) ty += 1
      if (xa != xb && ya != yb) {
        if ((xa < xb) == (ya < yb)) conc += 1 else disc += 1
      }
    }
    val n = xy.length.toLong
    val n0 = n * (n - 1) / 2
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("concordant") == conc, s"conc ${r.getAs[Long]("concordant")} vs $conc")
    assert(r.getAs[Long]("discordant") == disc)
    assert(r.getAs[Long]("ties_x") == tx)
    assert(r.getAs[Long]("ties_y") == ty)
    val tau = (conc - disc).toDouble /
      math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble)
    assert(math.abs(r.getAs[Double]("tau_b") - tau) < 1e-5)
  }

  test("ols: coefficients match a driver-side normal-equations solve; r2 in (0,1]") {
    import spark.implicits._
    val r = Stats.olsQ(spark, sfDir).collect().head
    val rows = graft.Tables.t(spark, sfDir, "lineitem")
      .select($"l_quantity".cast("double"), $"l_discount".cast("double"),
        $"l_extendedprice".cast("double")).collect()
      .map(w => (w.getDouble(0), math.round(w.getDouble(1) * 100).toDouble,
        w.getDouble(2)))
    val n = rows.length.toDouble
    val sq = rows.map(_._1).sum; val sd = rows.map(_._2).sum
    val sqq = rows.map(x => x._1 * x._1).sum
    val sdd = rows.map(x => x._2 * x._2).sum
    val sqd = rows.map(x => x._1 * x._2).sum
    val sy = rows.map(_._3).sum
    val sqy = rows.map(x => x._1 * x._3).sum
    val sdy = rows.map(x => x._2 * x._3).sum
    val syy = rows.map(x => x._3 * x._3).sum
    val (s11, s22, s12) = (n * sqq - sq * sq, n * sdd - sd * sd, n * sqd - sq * sd)
    val (sy1, sy2, syc) = (n * sqy - sq * sy, n * sdy - sd * sy, n * syy - sy * sy)
    val det = s11 * s22 - s12 * s12
    val b1 = (sy1 * s22 - sy2 * s12) / det
    val b2 = (sy2 * s11 - sy1 * s12) / det
    assert(r.getAs[Long]("n") == rows.length.toLong)
    assert(math.abs(r.getAs[Double]("b_quantity") - b1) < 1e-3,
      s"${r.getAs[Double]("b_quantity")} vs $b1")
    assert(math.abs(r.getAs[Double]("b_discount_pct") - b2) < 1e-3)
    assert(math.abs(r.getAs[Double]("intercept") -
      (sy - b1 * sq - b2 * sd) / n) < 1e-2)
    val r2 = r.getAs[Double]("r2")
    assert(r2 > 0.0 && r2 <= 1.0)
    assert(math.abs(r2 - (b1 * sy1 + b2 * sy2) / syc) < 1e-4)
  }

  test("kruskal: H matches a naive per-row average-rank recompute") {
    import spark.implicits._
    val r = Stats.kruskalQ(spark, sfDir).collect().head
    val rows = graft.Tables.t(spark, sfDir, "events")
      .select($"value", $"event_type").collect()
      .map(w => (w.getDouble(0), w.getString(1)))
    val n = rows.length
    // average ranks with ties
    val byV = rows.groupBy(_._1).view.mapValues(_.length).toMap
    val sortedV = byV.keys.toArray.sorted
    var before = 0L
    val avgRank = scala.collection.mutable.Map[Double, Double]()
    for (v <- sortedV) { avgRank(v) = before + (byV(v) + 1) / 2.0; before += byV(v) }
    val groups = rows.groupBy(_._2)
    val ssum = groups.values.map { g =>
      val rj = g.map(p => avgRank(p._1)).sum
      rj * rj / g.length
    }.sum
    val h = 12.0 / (n.toDouble * (n + 1)) * ssum - 3.0 * (n + 1)
    val tsum = byV.values.map(t => t.toLong * t * t - t).sum
    val hAdj = h / (1.0 - tsum.toDouble / (n.toDouble * n * n - n))
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("k") == groups.size)
    assert(math.abs(r.getAs[Double]("h") - h) < 1e-4,
      s"query ${r.getAs[Double]("h")} vs recompute $h")
    assert(math.abs(r.getAs[Double]("h_tie_adj") - hAdj) < 1e-4)
  }

  test("bh: p-values match a JVM recompute and the step-up decisions follow Benjamini-Hochberg exactly") {
    import spark.implicits._
    val rows = Stats.bhQ(spark, sfDir).collect()
    assert(rows.length == 5)
    val counts = graft.Tables.t(spark, sfDir, "events")
      .groupBy($"event_type")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(
          ($"value" > 100.0).cast("long")).as("x"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val nn = counts.values.map(_._1).sum.toDouble
    val xx = counts.values.map(_._2).sum.toDouble
    def phiTail(z: Double): Double = {
      val t = 1.0 / (1.0 + 0.2316419 * math.abs(z))
      val poly = t * (0.319381530 + t * (-0.356563782 + t *
        (1.781477937 + t * (-1.821255978 + t * 1.330274429))))
      2.0 * (math.exp(-z * z / 2.0) / 2.5066282746310002 * poly)
    }
    val want = counts.map { case (ty, (n, x)) =>
      val p1 = x.toDouble / n
      val p2 = (xx - x) / (nn - n)
      val pp = xx / nn
      val z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1.0 / n + 1.0 / (nn - n)))
      ty -> phiTail(z)
    }
    val ranked = want.toSeq.sortBy { case (ty, p) => (p, ty) }.zipWithIndex
      .map { case ((ty, p), i) => (ty, p, i + 1) }
    val kstar = ranked.filter { case (_, p, i) => p <= i * 0.05 / 5 }
      .map(_._3).maxOption.getOrElse(0)
    rows.foreach { r =>
      val ty = r.getString(0)
      val p = want(ty)
      assert(math.abs(r.getAs[Double]("p_value") - p) < 1e-7,
        s"$ty: p ${r.getAs[Double]("p_value")} vs recompute $p")
      val rank = ranked.find(_._1 == ty).get._3
      assert(r.getAs[Int]("p_rank") == rank)
      assert(r.getAs[Int]("rejected") == (if (rank <= kstar) 1 else 0),
        s"$ty: BH decision mismatch (kstar=$kstar)")
    }
  }

  test("theil-sen: per-type slope equals a JVM pairwise-median recompute") {
    import spark.implicits._
    val rows = TimeSeries.theilSenQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val daily = graft.Tables.t(spark, sfDir, "events")
      .groupBy($"event_type", org.apache.spark.sql.functions.to_date($"ts").as("d"))
      .agg(org.apache.spark.sql.functions.sum(
        $"value".cast("decimal(18,2)")).as("v"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getDecimal(2).doubleValue()))
      .groupBy(_._1)
    rows.foreach { r =>
      val ty = r.getString(0)
      val pts = daily(ty).map(t => (t._2, t._3)).sortBy(_._1)
      val slopes = (for {
        i <- pts.indices; j <- (i + 1) until pts.length
      } yield (pts(j)._2 - pts(i)._2) / (pts(j)._1 - pts(i)._1).toDouble).sorted
      assert(r.getAs[Long]("n_pairs") == slopes.length)
      val lowerMedian = slopes((slopes.length + 1) / 2 - 1)
      assert(math.abs(r.getAs[Double]("theil_sen_slope") -
        BigDecimal(lowerMedian).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) <= 1e-6,
        s"$ty: slope mismatch")
    }
  }

  test("xcorr: r matches a driver Pearson over the shifted dense series; lags cover -3..3") {
    import spark.implicits._
    val rows = TimeSeries.xcorrQ(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("lag")).toSeq == (-3L to 3L))
    val hourly = graft.Tables.t(spark, sfDir, "events")
      .filter($"event_type".isin("click", "purchase"))
      .groupBy(date_trunc("hour", $"ts").as("hour"))
      .agg(sum(when($"event_type" === "click", 1L).otherwise(0L)).as("xc"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("yc"))
      .collect().map(r => (r.getTimestamp(0).getTime, (r.getLong(1), r.getLong(2)))).toMap
    val start = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val xs = (0 until 720).map(i => hourly.getOrElse(start + i * 3600000L, (0L, 0L))._1)
    val ys = (0 until 720).map(i => hourly.getOrElse(start + i * 3600000L, (0L, 0L))._2)
    rows.foreach { r =>
      val k = r.getAs[Long]("lag").toInt
      val pairs = (0 until 720).flatMap { t =>
        val u = t + k
        if (u >= 0 && u < 720) Some((xs(t), ys(u))) else None
      }
      val n = pairs.length
      assert(r.getAs[Long]("n") == n)
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val exp = (n * sxy - sx * sy).toDouble /
        math.sqrt(((n * sxx - sx * sx) * (n * syy - sy * sy)).toDouble)
      assert(math.abs(r.getAs[Double]("r") - exp) < 1e-5, s"lag $k")
      assert(math.abs(r.getAs[Double]("r")) <= 1.0)
    }
  }

  test("holt: level/trend equal a sequential driver fold and the forecast is their sum") {
    import spark.implicits._
    val rows = TimeSeries.holtQ(spark, sfDir).collect()
    val daily = graft.Tables.t(spark, sfDir, "events")
      .groupBy($"event_type", to_date($"ts").as("d")).count()
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val ty = r.getAs[String]("event_type")
      val xs = daily(ty).sortBy(_._2.toEpochDay).map(_._3.toDouble)
      assert(r.getAs[Long]("n_days") == xs.length)
      var l = xs(0)
      var b = xs(1) - xs(0)
      xs.drop(1).foreach { x =>
        val l2 = 0.5 * x + 0.5 * (l + b)
        b = 0.3 * (l2 - l) + 0.7 * b
        l = l2
      }
      assert(math.abs(r.getAs[Double]("level") - l) < 1e-5, s"$ty level")
      assert(math.abs(r.getAs[Double]("trend") - b) < 1e-5, s"$ty trend")
      assert(math.abs(r.getAs[Double]("forecast") - (l + b)) < 1e-5)
    }
  }

  test("holt-winters: level/trend/seasonal state equal a sequential driver fold with a rotating 7-slot buffer") {
    import spark.implicits._
    val rows = TimeSeries.holtWintersQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val daily = graft.Tables.t(spark, sfDir, "events")
      .groupBy($"event_type", to_date($"ts").as("d")).count()
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val ty = r.getAs[String]("event_type")
      val xs = daily(ty).sortBy(_._2.toEpochDay).map(_._3.toDouble)
      assert(xs.length >= 15 && r.getAs[Long]("n_days") == xs.length)
      var l = (xs(0) + xs(1) + xs(2) + xs(3) + xs(4) + xs(5) + xs(6)) / 7
      var b = ((xs(7) + xs(8) + xs(9) + xs(10) + xs(11) + xs(12) + xs(13)) / 7 - l) / 7
      var seas = xs.take(7).map(_ - l).toVector
      xs.drop(14).foreach { x =>
        val sh = seas.head
        val l2 = 0.5 * (x - sh) + 0.5 * (l + b)
        b = 0.3 * (l2 - l) + 0.7 * b
        val s2 = 0.2 * (x - l2) + 0.8 * sh
        seas = seas.tail :+ s2
        l = l2
      }
      assert(math.abs(r.getAs[Double]("level") - l) < 1e-5, s"$ty level")
      assert(math.abs(r.getAs[Double]("trend") - b) < 1e-5, s"$ty trend")
      assert(math.abs(r.getAs[Double]("season_next") - seas.head) < 1e-5)
      assert(math.abs(r.getAs[Double]("forecast") - (l + b + seas.head)) < 1e-5)
      assert(math.abs(r.getAs[Double]("seasonal_amplitude") -
        (seas.max - seas.min)) < 1e-5)
    }
  }

  test("power: n_required matches the closed-form two-proportion formula from the observed rates") {
    val r = Stats.powerQ(spark, sfDir).collect().head
    val (p1, p2) = (r.getAs[Double]("rate_a"), r.getAs[Double]("rate_b"))
    val pb = r.getAs[Double]("lift") // recompute pb from lift? use rates
    val pbar = (p1 * r.getAs[Long]("n_have") + p2 * r.getAs[Long]("n_have")) /
      (2.0 * r.getAs[Long]("n_have")) // equal-arm approximation check only
    val za = 1.959963984540054
    val zb = 0.8416212335729143
    // direct formula from the reported (rounded) rates — tolerance covers
    // the 6-dp rounding of the rates vs the query's exact-rate arithmetic
    val pBar = (p1 + p2) / 2
    val n = math.pow(za * math.sqrt(2 * pBar * (1 - pBar)) +
      zb * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2)), 2) /
      math.pow(p2 - p1, 2)
    val got = r.getAs[Long]("n_required").toDouble
    assert(math.abs(got - n) / n < 0.02, s"n_required $got vs ~$n")
    assert(r.getAs[Long]("powered") ==
      (if (r.getAs[Long]("n_have") >= r.getAs[Long]("n_required")) 1L else 0L))
    assert(got > 0 && math.abs(pb) > 0)
    assert(pbar > 0 && pbar < 1)
  }

  test("burstiness: fano and rate ratios match a driver per-document recount") {
    import spark.implicits._
    val rows = graft.ops.Colloc.burstinessQ(spark, sfDir).collect()
    assert(rows.length == 15)
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select($"text").collect().map(_.getString(0))
    val nd = docs.length.toDouble
    rows.foreach { r =>
      val term = r.getAs[String]("term")
      val tfs = docs.map(_.toLowerCase.split(" ").count(_ == term).toLong)
      val df = tfs.count(_ > 0).toLong
      val tot = tfs.sum
      assert(r.getAs[Long]("df") == df, s"$term df")
      assert(r.getAs[Long]("t_total") == tot, s"$term total")
      val mean = tot / nd
      val variance = (tfs.map(x => x * x).sum - tot * tot / nd) / nd
      assert(math.abs(r.getAs[Double]("fano") - variance / mean) < 1e-4,
        s"$term fano")
      assert(math.abs(r.getAs[Double]("burstiness") -
        (tot.toDouble / df) / mean) < 1e-4, s"$term burstiness")
      assert(r.getAs[Double]("burstiness") >= 1.0 - 1e-9,
        "within-doc rate can't be below the global rate")
    }
  }

  test("entropy rate: decomposition matches a driver recompute and is bounded by ln(#states)") {
    import spark.implicits._
    val rows = graft.ops.Patterns.entropyRateQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // driver recompute of P, pi (3 power steps from uniform), H
    val seqs = graft.Tables.t(spark, sfDir, "events")
      .select($"user_id", $"ts", $"event_id", $"event_type").collect()
      .map(r => (r.getLong(0), (r.getTimestamp(1).getTime, r.getLong(2), r.getString(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(t => (t._1, t._2)).map(_._3))
    val trans = seqs.values.flatMap(s0 => s0.zip(s0.tail))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bySrc = trans.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    def r9(d: Double) = BigDecimal(d).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val p = trans.map { case ((a, b), n) => ((a, b), r9(n.toDouble / bySrc(a))) }
    val states = bySrc.keys.toSeq.sorted
    var pi = states.map(_ -> 0.2).toMap
    (1 to 3).foreach { _ =>
      pi = states.map { d =>
        d -> r9(p.collect { case ((a, b), pv) if b == d =>
          BigDecimal(r9(pi(a) * pv)) }.sum.toDouble)
      }.toMap
    }
    val hTot = rows.map(_.getAs[Double]("contribution")).sum
    assert(hTot > 0 && hTot <= math.log(states.size) + 1e-6)
    rows.foreach { r =>
      val st = r.getAs[String]("state")
      assert(math.abs(r.getAs[Double]("pi") - pi(st)) < 1e-6, s"$st pi")
      val h = p.collect { case ((a, _), pv) if a == st =>
        BigDecimal(r9(-pv * math.log(pv))) }.sum.toDouble
      assert(math.abs(r.getAs[Double]("h_cond") - h) < 1e-5, s"$st h")
      assert(math.abs(r.getAs[Double]("contribution") -
        BigDecimal(pi(st) * h).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 2e-6)
    }
  }

  test("dispersion: chi2 = (n-1)*D and D matches a driver variance/mean recompute") {
    import spark.implicits._
    val rows = Stats.dispersionQ(spark, sfDir).collect()
    val daily = graft.Tables.t(spark, sfDir, "events")
      .groupBy($"event_type", to_date($"ts").as("day")).count()
      .collect().map(r => (r.getString(0), r.getLong(2))).groupBy(_._1)
    rows.foreach { r =>
      val ty = r.getAs[String]("event_type")
      val cs = daily(ty).map(_._2.toDouble)
      val n = cs.length
      assert(r.getAs[Long]("n_days") == n)
      assert(r.getAs[Long]("total") == cs.sum.toLong)
      val mean = cs.sum / n
      val v = (cs.map(c => c * c).sum - cs.sum * cs.sum / n) / (n - 1)
      assert(math.abs(r.getAs[Double]("dispersion") - v / mean) < 1e-5)
      assert(math.abs(r.getAs[Double]("chi2") -
        (n - 1) * r.getAs[Double]("dispersion")) < 1e-4)
    }
  }

  test("logrank: O-E sums to zero across the two cohorts' symmetric halves and matches a driver recompute") {
    import spark.implicits._
    val r = Stats.logrankQ(spark, sfDir).collect().head
    // driver recompute from per-user lifetimes
    val life = graft.Tables.t(spark, sfDir, "events")
      .groupBy($"user_id")
      .agg(expr("(max(unix_micros(ts)) - min(unix_micros(ts))) div 86400000000")
        .as("lt"))
      .collect().map(x => (x.getLong(1), x.getLong(0) % 2))
    val byT = life.groupBy(_._1).view.mapValues { g =>
      (g.length.toLong, g.count(_._2 == 1).toLong) }.toMap
    val ts = byT.keys.toSeq.sorted
    var (oe, vv) = (BigDecimal(0), BigDecimal(0))
    ts.foreach { t0 =>
      val (d, d1) = byT(t0)
      val n = ts.filter(_ >= t0).map(byT(_)._1).sum
      val n1 = ts.filter(_ >= t0).map(byT(_)._2).sum
      oe += BigDecimal(d1 - d.toDouble * n1 / n)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      if (n > 1) vv += BigDecimal(d * (n1.toDouble / n) * (1.0 - n1.toDouble / n) *
        (n - d).toDouble / (n - 1.0)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }
    assert(math.abs(r.getAs[Double]("o_minus_e") - oe.toDouble) < 1e-5)
    assert(math.abs(r.getAs[Double]("variance") - vv.toDouble) < 1e-5)
    assert(math.abs(r.getAs[Double]("z") -
      oe.toDouble / math.sqrt(vv.toDouble)) < 1e-5)
  }

  test("jsd: terms are bounded, symmetric in p/q, and match a driver recompute") {
    import spark.implicits._
    val rows = graft.ops.Drift.jsdQ(spark, sfDir).collect()
    val totRef = rows.map(_.getAs[Long]("n_ref")).sum.toDouble
    val totCur = rows.map(_.getAs[Long]("n_cur")).sum.toDouble
    rows.foreach { r =>
      val p = r.getAs[Long]("n_ref") / totRef
      val q = r.getAs[Long]("n_cur") / totCur
      val m = (p + q) / 2
      val jsd = p * math.log(p / m) / 2 + q * math.log(q / m) / 2
      val hell = (math.sqrt(p) - math.sqrt(q)) * (math.sqrt(p) - math.sqrt(q)) / 2
      assert(math.abs(r.getAs[Double]("jsd_term") - jsd) < 1e-5)
      assert(math.abs(r.getAs[Double]("hell_term") - hell) < 1e-5)
      assert(r.getAs[Double]("jsd_term") >= -1e-9 &&
        r.getAs[Double]("jsd_term") <= math.log(2))
      assert(r.getAs[Double]("hell_term") >= -1e-9 &&
        r.getAs[Double]("hell_term") <= 1.0)
    }
  }

  test("gtest: G and Pearson chi2 match a driver recompute; G ~ chi2 on this table") {
    import spark.implicits._
    val row = Stats.gtestQ(spark, sfDir).collect().head
    val cells = graft.Tables.t(spark, sfDir, "events")
      .select($"event_type", $"value").collect()
      .map { r =>
        val v = r.getDouble(1)
        (r.getString(0),
          if (v < 5.0) "v0" else if (v < 20.0) "v1"
          else if (v < 100.0) "v2" else "v3")
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = cells.values.sum
    val rt = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val ct = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    assert(row.getAs[Long]("n") == n)
    assert(row.getAs[Long]("n_rows") == rt.size)
    assert(row.getAs[Long]("n_cols") == ct.size)
    assert(row.getAs[Long]("dof") == (rt.size - 1).toLong * (ct.size - 1))
    def r10(d: Double) =
      BigDecimal(d).setScale(10, BigDecimal.RoundingMode.HALF_UP)
    val gs = cells.map { case ((a, b), o) =>
      r10(o.toDouble * math.log(o.toDouble * n / (rt(a).toDouble * ct(b))))
    }.sum.toDouble
    val ps = cells.map { case ((a, b), o) =>
      r10(o.toDouble * o / (rt(a).toDouble * ct(b)))
    }.sum.toDouble
    def r6(d: Double) =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(row.getAs[Double]("g_stat") - r6(2.0 * gs)) < 1e-9)
    assert(math.abs(row.getAs[Double]("chi2_stat") - r6(n * (ps - 1.0))) < 1e-9)
    // asymptotic equivalence sanity: same order of magnitude, both ≥ 0
    assert(row.getAs[Double]("g_stat") >= 0.0)
    assert(row.getAs[Double]("chi2_stat") >= 0.0)
    assert(row.getAs[Double]("g_stat") <
      4.0 * math.max(row.getAs[Double]("chi2_stat"), 1.0))
  }

  test("reservoir: A-Res keys match the hash contract; top-50 is the true top-50") {
    import spark.implicits._
    val rows = Stats.reservoirQ(spark, sfDir).collect()
    assert(rows.length == 50)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(x: String): Long = {
      val hex = md.digest(x.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val all = graft.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", $"n_chars").collect()
      .map { r =>
        val id = r.getLong(0); val w = r.getLong(1)
        val u = (h60(s"res:$id") + 1L).toDouble / 1152921504606846976L.toDouble
        (id, w, math.log(u) / w.toDouble)
      }
    val expected = all.sortBy { case (id, _, k) => (-k, id) }.take(50)
    rows.zip(expected).foreach { case (r, (id, w, k)) =>
      assert(r.getAs[Long]("doc_id") == id)
      assert(r.getAs[Long]("weight") == w)
      assert(math.abs(r.getAs[Double]("key_ln") -
        BigDecimal(k).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble)
        < 1e-12, s"doc $id key")
    }
    // weighting sanity: the sample over-represents heavy docs vs uniform
    val sampleMeanW = rows.map(_.getAs[Long]("weight")).sum.toDouble / 50
    val popMeanW = all.map(_._2).sum.toDouble / all.length
    assert(sampleMeanW > popMeanW, "weighted sampling should favor long docs")
  }

  test("ht: Horvitz-Thompson totals match a driver replay; estimate is near-unbiased") {
    import spark.implicits._
    val row = Stats.htQ(spark, sfDir).collect().head
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(x: String): Long = {
      val hex = md.digest(x.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val orders = graft.Tables.t(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val wDec = orders.map(o => BigDecimal(o._2).setScale(2)).sum
    val w = wDec.toDouble
    assert(row.getAs[Long]("n_pop") == orders.length)
    assert(row.getAs[Double]("true_total") == w)
    def r6bd(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val sampled = orders.map { case (k, v) =>
      val pi = math.min(1.0, 500.0 * v / w)
      val u = (h60(s"ht:$k") + 1L).toDouble / 1152921504606846976L.toDouble
      (v, pi, u < pi)
    }.filter(_._3)
    assert(row.getAs[Long]("n_sample") == sampled.length)
    val ht = sampled.map { case (v, pi, _) => r6bd(v / pi) }.sum.toDouble
    val vht = sampled.map { case (v, pi, _) =>
      r6bd(v * v * (1.0 - pi) / (pi * pi)) }.sum.toDouble
    def r2(d: Double) = BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(row.getAs[Double]("ht_total") - r2(ht)) < 1e-9)
    assert(math.abs(row.getAs[Double]("ht_se") - r2(math.sqrt(vht))) < 1e-9)
    // design promises: expected sample size = k, estimate within a few SE
    assert(sampled.length > 300 && sampled.length < 700, s"got ${sampled.length}")
    assert(math.abs(ht - w) < 4.0 * math.sqrt(vht), "HT total within 4 SE of truth")
  }

  test("bland-altman: bias and limits match a driver replay; ~95% of users inside") {
    import spark.implicits._
    val row = Stats.blandAltmanQ(spark, sfDir).collect().head
    val per = graft.Tables.t(spark, sfDir, "events")
      .filter($"event_type".isin("click", "view")).collect()
      .map(r => ((r.getAs[Long]("user_id"), r.getAs[String]("event_type")),
        r.getAs[Double]("value")))
      .groupBy(_._1).view.mapValues { vs =>
        vs.map(v => BigDecimal(v._2).setScale(6)).sum.toDouble / vs.length
      }.toMap
    val users = per.keySet.map(_._1)
    val ds = users.toSeq.sorted.flatMap { u =>
      for (a <- per.get((u, "click")); b <- per.get((u, "view")))
        yield a - b
    }
    assert(row.getAs[Long]("n_users") == ds.length)
    def r12bd(d: Double) = BigDecimal(d).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val n = ds.length
    val s1 = ds.map(r12bd).sum.toDouble
    val s2 = ds.map(d => r12bd(d * d)).sum.toDouble
    val bias = s1 / n
    val sd = math.sqrt((s2 - s1 * s1 / n) / (n - 1.0))
    val (lo, hi) = (bias - 1.96 * sd, bias + 1.96 * sd)
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(row.getAs[Double]("bias_d") - r6(bias)) < 1e-9)
    assert(math.abs(row.getAs[Double]("sd_d") - r6(sd)) < 1e-9)
    assert(math.abs(row.getAs[Double]("loa_lo") - r6(lo)) < 1e-9)
    assert(math.abs(row.getAs[Double]("loa_hi") - r6(hi)) < 1e-9)
    val within = ds.count(d => d >= lo && d <= hi)
    assert(row.getAs[Long]("n_within") == within)
    // the method's promise: roughly 95% of paired diffs inside the limits
    assert(row.getAs[Long]("within_bp") >= 8800, "limits should cover ~95%")
  }

  test("effect size: d/g/glass/cliffs match a driver replay; identities hold") {
    import spark.implicits._
    val row = Stats.effectSizeQ(spark, sfDir).collect().head
    val ev = graft.Tables.t(spark, sfDir, "events")
      .filter($"event_type".isin("click", "view"))
      .select($"event_type", $"value").collect()
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1)).setScale(2)))
    val a = ev.filter(_._1 == "click").map(_._2)
    val b = ev.filter(_._1 == "view").map(_._2)
    val (n1, n2) = (a.length, b.length)
    assert(row.getAs[Long]("n1") == n1 && row.getAs[Long]("n2") == n2)
    val (s1, q1) = (a.sum.toDouble, a.map(x => x * x).sum.toDouble)
    val (s2, q2) = (b.sum.toDouble, b.map(x => x * x).sum.toDouble)
    val (m1, m2) = (s1 / n1, s2 / n2)
    val v1 = (q1 - s1 * s1 / n1) / (n1 - 1)
    val v2 = (q2 - s2 * s2 / n2) / (n2 - 1)
    val d = (m1 - m2) / math.sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2))
    val g = d * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9))
    // Cliff's delta by brute-force dominance count (the definition)
    var gt = 0L; var lt = 0L
    for (x <- a; y <- b) { if (x > y) gt += 1 else if (x < y) lt += 1 }
    val cliffs = (gt - lt).toDouble / (n1.toDouble * n2)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(row.getAs[Double]("cohens_d") - r6(d)) < 1e-9)
    assert(math.abs(row.getAs[Double]("hedges_g") - r6(g)) < 1e-9)
    assert(math.abs(row.getAs[Double]("glass_delta") - r6((m1 - m2) / math.sqrt(v2))) < 1e-9)
    assert(math.abs(row.getAs[Double]("cliffs_delta") - cliffs) < 1e-6,
      s"rank-derived ${row.getAs[Double]("cliffs_delta")} vs brute-force $cliffs")
    // |g| < |d| (shrinkage), delta in [-1, 1]
    assert(math.abs(row.getAs[Double]("hedges_g")) <
      math.abs(row.getAs[Double]("cohens_d")))
    assert(math.abs(row.getAs[Double]("cliffs_delta")) <= 1.0)
  }

  test("tukey hsd: 10 pairs, q matches a driver replay, anova-consistent MSE") {
    import spark.implicits._
    val rows = Stats.tukeyHsdQ(spark, sfDir).collect()
    assert(rows.length == 10)
    val ev = graft.Tables.t(spark, sfDir, "events")
      .select($"event_type", $"value").collect()
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1)).setScale(2)))
    val types = Seq("click", "error", "purchase", "signup", "view")
    val by = types.map(tp => tp -> ev.filter(_._1 == tp).map(_._2)).toMap
    val n = ev.length
    val ssw = types.map { tp =>
      val xs = by(tp); val s = xs.sum.toDouble; val q = xs.map(x => x * x).sum.toDouble
      q - s * s / xs.length
    }.sum
    val mse = ssw / (n - types.size)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { r =>
      val (ta, tb) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      val (xa, xb) = (by(ta), by(tb))
      assert(r.getAs[Long]("n_a") == xa.length && r.getAs[Long]("n_b") == xb.length)
      assert(r.getAs[Long]("dof_w") == n - types.size)
      val diff = xa.sum.toDouble / xa.length - xb.sum.toDouble / xb.length
      val se = math.sqrt(mse / 2.0 * (1.0 / xa.length + 1.0 / xb.length))
      assert(math.abs(r.getAs[Double]("mean_diff") - r6(diff)) < 1e-7)
      assert(math.abs(r.getAs[Double]("q_stat") - r6(math.abs(diff) / se)) < 1e-5)
    }
  }

  test("bartlett: statistic matches a driver replay and is non-negative") {
    import spark.implicits._
    val row = Stats.bartlettQ(spark, sfDir).collect().head
    val ev = graft.Tables.t(spark, sfDir, "events")
      .select($"event_type", $"value").collect()
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1)).setScale(2)))
    val types = Seq("click", "error", "purchase", "signup", "view")
    val k = types.size; val n = ev.length
    val vis = types.map { tp =>
      val xs = ev.filter(_._1 == tp).map(_._2)
      val s = xs.sum.toDouble; val q = xs.map(x => x * x).sum.toDouble
      (xs.length, (q - s * s / xs.length) / (xs.length - 1))
    }
    val sp2 = vis.map { case (ni, vi) => (ni - 1) * vi }.sum / (n - k)
    val sumLn = vis.map { case (ni, vi) => (ni - 1) * math.log(vi) }.sum
    val sumInv = vis.map { case (ni, _) => 1.0 / (ni - 1) }.sum
    val c = 1.0 + (sumInv - 1.0 / (n - k)) / (3.0 * (k - 1))
    val tstat = ((n - k) * math.log(sp2) - sumLn) / c
    assert(row.getAs[Long]("n") == n && row.getAs[Long]("k") == k)
    assert(math.abs(row.getAs[Double]("t_stat") - tstat) < 1e-4,
      s"query ${row.getAs[Double]("t_stat")} vs replay $tstat")
    assert(row.getAs[Double]("t_stat") >= 0.0)
  }

  test("cochran q: exact-integer replay; zero statistic on identical columns") {
    import spark.implicits._
    val row = Stats.cochranQQ(spark, sfDir).collect().head
    val types = Seq("click", "error", "purchase", "signup", "view")
    val k = types.size
    val x = graft.Tables.t(spark, sfDir, "events").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Double]("value")))
      .groupBy(_._1).view.mapValues { es =>
        types.map(tp => if (es.exists(e => e._2 == tp && e._3 >= 50.0)) 1L else 0L)
      }.toMap
    val b = x.size
    val ris = x.values.map(_.sum)
    val tt = ris.sum; val r2 = ris.map(r => r * r).sum
    val cs = types.indices.map(j => x.values.map(_(j)).sum)
    val q = ((k - 1) * (k * cs.map(c => c * c).sum - tt * tt)).toDouble /
      (k * tt - r2).toDouble
    assert(row.getAs[Long]("b") == b)
    assert(row.getAs[Long]("t_successes") == tt)
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(row.getAs[Double]("q_stat") - r6(q)) < 1e-9)
  }

  test("cvm: U and T match a driver EDF replay; T equals the direct integral form") {
    import spark.implicits._
    val r = Stats.cvmQ(spark, sfDir).collect().head
    val obs = graft.Tables.t(spark, sfDir, "events")
      .filter($"event_type".isin("click", "view"))
      .select($"event_id", $"event_type", $"value").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getDouble(2)))
      .sortBy { case (id, _, v) => (v, id) }
    val n = obs.count(_._2 == "click"); val m = obs.count(_._2 == "view")
    assert(r.getAs[Long]("n") == n && r.getAs[Long]("m") == m)
    var i1 = 0; var i2 = 0; var d1 = 0L; var d2 = 0L
    obs.zipWithIndex.foreach { case ((_, tp, _), idx) =>
      val rk = idx + 1
      if (tp == "click") { i1 += 1; d1 += (rk - i1).toLong * (rk - i1) }
      else { i2 += 1; d2 += (rk - i2).toLong * (rk - i2) }
    }
    val u = n.toLong * d1 + m.toLong * d2
    assert(r.getAs[Double]("u") == u.toDouble)
    val t = u.toDouble / (n.toDouble * m * (n + m)) -
      (4.0 * n * m - 1) / (6.0 * (n + m))
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("t_stat") - r6(t)) < 1e-9)
    // cross-check against the direct EDF-integral form of the statistic:
    // T = nm/(n+m)^2 * sum over all positions of (F1 - F2)^2
    var c1 = 0; var c2 = 0; var s = 0.0
    obs.foreach { case (_, tp, _) =>
      if (tp == "click") c1 += 1 else c2 += 1
      val diff = c1.toDouble / n - c2.toDouble / m
      s += diff * diff
    }
    val tDirect = n.toDouble * m / math.pow(n + m, 2) * s
    assert(math.abs(t - tDirect) < 1e-6,
      s"rank form $t vs integral form $tDirect")
  }

  test("siegel-tukey: ST ranks are a permutation of 1..N; z matches a driver replay") {
    import spark.implicits._
    val r = Stats.siegelTukeyQ(spark, sfDir).collect().head
    val obs = graft.Tables.t(spark, sfDir, "events")
      .filter($"event_type".isin("click", "view"))
      .select($"event_id", $"event_type", $"value").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getDouble(2)))
      .sortBy { case (id, _, v) => (v, id) }
    val nn = obs.length
    def stRank(p: Int): Long =
      if (p <= (nn + 1) / 2) 2L * p - (p % 2)
      else { val m = nn - p + 1; 2L * m - ((m + 1) % 2) }
    val ranks = (1 to nn).map(stRank)
    assert(ranks.sorted == (1 to nn).map(_.toLong), "ST ranks permute 1..N")
    val r1 = obs.zipWithIndex.collect {
      case ((_, "click", _), i) => stRank(i + 1) }.sum
    assert(r.getAs[Long]("r1") == r1)
    val n1 = obs.count(_._2 == "click"); val n2 = nn - n1
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2)
    val u1 = r1.toDouble - n1.toDouble * (n1 + 1) / 2
    val z = (u1 - n1.toDouble * n2 / 2) /
      math.sqrt(n1.toDouble * n2 * (n1 + n2 + 1) / 12)
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("z") - r6(z)) < 1e-9)
  }

  test("jonckheere: JT matches a brute-force pairwise driver replay") {
    import spark.implicits._
    val r = Stats.jonckheereQ(spark, sfDir).collect().head
    val start = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val obs = graft.Tables.t(spark, sfDir, "events")
      .filter($"ts" < lit("2024-01-29").cast("timestamp"))
      .select($"ts", $"value").collect()
      .map(x => (((x.getTimestamp(0).getTime - start) / 86400000L / 7) + 1,
        x.getDouble(1)))
    val k = 4
    val groups = (1 to k).map(j => obs.filter(_._1 == j).map(_._2))
    val n = obs.length
    assert(r.getAs[Long]("n") == n && r.getAs[Long]("k") == k)
    // brute-force U sums (ties count half)
    var jt = BigDecimal(0)
    for (j <- 0 until k; kk <- j + 1 until k; x <- groups(j); y <- groups(kk)) {
      if (x < y) jt += 1
      else if (x == y) jt += BigDecimal(1) / 2
    }
    assert(r.getAs[Double]("jt_stat") == jt.toDouble,
      s"JT ${r.getAs[Double]("jt_stat")} vs brute force $jt")
    val ns = groups.map(_.length.toLong)
    val e = (n.toLong * n - ns.map(x => x * x).sum).toDouble / 4
    val v = (n.toDouble * n * (2 * n + 3) -
      ns.map(x => x.toDouble * x * (2 * x + 3)).sum) / 72.0
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("z") - r6((jt.toDouble - e) / math.sqrt(v))) < 1e-9)
  }

  test("moods median: chi2 matches a driver above/below replay on the exact global median") {
    import spark.implicits._
    val r = Stats.moodsMedianQ(spark, sfDir).collect().head
    val ev = graft.Tables.t(spark, sfDir, "events")
      .select($"event_type", $"value").collect()
      .map(x => (x.getString(0), x.getDouble(1)))
    val sortedVals = ev.map(_._2).sorted
    val median = sortedVals((ev.length + 1) / 2 - 1)
    val types = ev.map(_._1).distinct.sorted
    assert(r.getAs[Long]("n") == ev.length)
    assert(r.getAs[Long]("k") == types.length)
    assert(r.getAs[Long]("dof") == types.length - 1)
    val ta = ev.count(_._2 > median).toDouble
    val nn = ev.length.toDouble
    def r9(d: Double) = BigDecimal(d).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val chi2 = types.map { tp =>
      val g = ev.filter(_._1 == tp)
      val n = g.length.toDouble
      val above = g.count(_._2 > median).toDouble
      val eA = n * ta / nn; val eB = n * (nn - ta) / nn
      r9((above - eA) * (above - eA) / eA +
        ((n - above) - eB) * ((n - above) - eB) / eB)
    }.sum.toDouble
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("chi2_stat") - r6(chi2)) < 1e-9,
      s"${r.getAs[Double]("chi2_stat")} vs replay $chi2")
    assert(r.getAs[Double]("chi2_stat") >= 0.0)
  }

  test("ca trend: Z matches an exact-integer driver replay over the weekly table") {
    import spark.implicits._
    val r = Stats.caTrendQ(spark, sfDir).collect().head
    val start = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val cells = graft.Tables.t(spark, sfDir, "events")
      .filter($"ts" < lit("2024-01-29").cast("timestamp"))
      .select($"ts", $"value").collect()
      .map(x => ((x.getTimestamp(0).getTime - start) / 86400000L / 7 + 1,
        x.getDouble(1) >= 50.0))
    val byW = cells.groupBy(_._1).view
      .mapValues(vs => (vs.length.toLong, vs.count(_._2).toLong)).toMap
    val nn = byW.values.map(_._1).sum; val xx = byW.values.map(_._2).sum
    val swx = byW.map { case (w, (_, x)) => w * x }.sum
    val swn = byW.map { case (w, (n0, _)) => w * n0 }.sum
    val sw2n = byW.map { case (w, (n0, _)) => w * w * n0 }.sum
    assert(r.getAs[Long]("n") == nn && r.getAs[Long]("successes") == xx)
    val p = xx.toDouble / nn
    val z = (swx.toDouble - swn.toDouble * xx.toDouble / nn) /
      math.sqrt(p * (1.0 - p) * (sw2n.toDouble - swn.toDouble * swn / nn))
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("z_trend") - r6(z)) < 1e-9)
  }

  test("cluster sample: estimate/icc/deff match an ANOVA driver replay; deff identity") {
    import spark.implicits._
    val r = Stats.clusterSampleQ(spark, sfDir).collect().head
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(x: String): Long = {
      val hex = md.digest(x.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val per = graft.Tables.t(spark, sfDir, "events")
      .select($"user_id", $"value").collect()
      .map(x => (x.getLong(0), BigDecimal(x.getDouble(1)).setScale(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val k = per.size; val n = per.values.map(_.length).sum
    assert(r.getAs[Long]("n_clusters") == k && r.getAs[Long]("n_events") == n)
    val tsx = per.values.flatten.sum.toDouble
    val tsxx = per.values.flatten.map(v => v * v).sum.toDouble
    def r10(d: Double) = BigDecimal(d).setScale(10, BigDecimal.RoundingMode.HALF_UP)
    val sbRaw = per.values.map { vs =>
      val s = vs.sum.toDouble; r10(s * s / vs.length) }.sum.toDouble
    val sampled = per.filter { case (u, _) => h60(s"cs:$u") % 2 == 0 }
    assert(r.getAs[Long]("n_sampled_clusters") == sampled.size)
    val est = sampled.values.flatten.sum.toDouble /
      sampled.values.map(_.length).sum
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("cluster_estimate") - r6(est)) < 1e-9)
    val msb = (sbRaw - tsx * tsx / n) / (k - 1)
    val msw = (tsxx - sbRaw) / (n - k)
    val m0 = n.toDouble / k
    val icc = (msb - msw) / (msb + (m0 - 1) * msw)
    assert(math.abs(r.getAs[Double]("icc") - r6(icc)) < 1e-9)
    // deff = 1 + (m0-1)*icc identity
    assert(math.abs(r.getAs[Double]("deff") -
      r6(1.0 + (m0 - 1) * icc)) < 2e-6)
    // sanity: the ~50% cluster sample lands near the truth
    assert(math.abs(r.getAs[Double]("cluster_estimate") -
      r.getAs[Double]("true_mean")) < 5.0)
  }

  test("brunner-munzel: p-hat and W match a per-observation driver replay") {
    import spark.implicits._
    val r = Stats.brunnerMunzelQ(spark, sfDir).collect().head
    val ev = graft.Tables.t(spark, sfDir, "events")
      .filter($"event_type".isin("click", "view"))
      .select($"event_type", $"value").collect()
      .map(x => (x.getString(0), x.getDouble(1)))
    val a = ev.filter(_._1 == "click").map(_._2)
    val b = ev.filter(_._1 == "view").map(_._2)
    val (n1, n2) = (a.length, b.length)
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2)
    // per-observation midranks, brute force (sf0.001 sizes allow O(n^2))
    val all = a ++ b
    def midrank(pool: Array[Double], v: Double): Double =
      pool.count(_ < v) + (pool.count(_ == v) + 1) / 2.0
    val gr1 = a.map(v => midrank(all, v)); val gr2 = b.map(v => midrank(all, v))
    val in1 = a.map(v => midrank(a, v)); val in2 = b.map(v => midrank(b, v))
    val rb1 = gr1.sum / n1; val rb2 = gr2.sum / n2
    def s2(gr: Array[Double], in: Array[Double], rb: Double, n: Int): Double =
      gr.zip(in).map { case (g, i) =>
        val d = g - i - rb + (n + 1) / 2.0; d * d
      }.sum / (n - 1)
    val s1 = s2(gr1, in1, rb1, n1); val s22 = s2(gr2, in2, rb2, n2)
    val pHat = (rb2 - (n2 + 1) / 2.0) / n1
    val w = n1.toDouble * n2 * (rb2 - rb1) /
      ((n1 + n2).toDouble * math.sqrt(n1 * s1 + n2 * s22))
    assert(math.abs(r.getAs[Double]("p_hat") - pHat) < 1e-6)
    assert(math.abs(r.getAs[Double]("w_stat") - w) < 1e-4,
      s"W ${r.getAs[Double]("w_stat")} vs replay $w")
    assert(r.getAs[Double]("p_hat") >= 0 && r.getAs[Double]("p_hat") <= 1)
  }

  test("page trend: L matches a driver weekly-midrank replay") {
    import spark.implicits._
    val r = Stats.pageTrendQ(spark, sfDir).collect().head
    val k = 4
    val start = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val cells = graft.Tables.t(spark, sfDir, "events")
      .filter($"ts" < lit("2024-01-29").cast("timestamp"))
      .select($"user_id", $"ts", $"value").collect()
      .map { x =>
        val days = (x.getTimestamp(1).getTime - start) / 86400000L
        ((x.getLong(0), (days / 7 + 1).toInt),
          BigDecimal(x.getDouble(2)).setScale(2))
      }
      .groupBy(_._1).view.mapValues(vs =>
        vs.map(_._2).sum.toDouble / vs.length).toMap
    val users = cells.keySet.map(_._1)
      .filter(u => (1 to k).forall(w => cells.contains((u, w)))).toSeq
    assert(r.getAs[Long]("b") == users.length)
    var l = BigDecimal(0)
    users.foreach { u =>
      val vs = (1 to k).map(w => w -> cells((u, w)))
      vs.foreach { case (w, v) =>
        val less = vs.count(_._2 < v); val eq = vs.count(_._2 == v)
        l += w * (BigDecimal(2 * (less + 1) + eq - 1) / 2)
      }
    }
    val b = users.length
    assert(r.getAs[Double]("l_stat") == l.toDouble)
    val z = (l.toDouble - b.toDouble * k * (k + 1) * (k + 1) / 4) /
      math.sqrt(b.toDouble * k * k * (k + 1) * (k * k - 1) / 144.0)
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("z") - r6(z)) < 1e-9)
  }

  test("lin ccc: agreement matches a driver replay; |ccc| <= |r| (accuracy shrinks)") {
    import spark.implicits._
    val r = Stats.linCccQ(spark, sfDir).collect().head
    val per = graft.Tables.t(spark, sfDir, "events")
      .filter($"event_type".isin("click", "view")).collect()
      .map(x => ((x.getAs[Long]("user_id"), x.getAs[String]("event_type")),
        BigDecimal(x.getAs[Double]("value")).setScale(2)))
      .groupBy(_._1).view.mapValues(vs =>
        vs.map(_._2).sum.toDouble / vs.length).toMap
    val users = per.keySet.map(_._1)
      .filter(u => per.contains((u, "click")) && per.contains((u, "view")))
      .toSeq.sorted
    val n = users.length
    assert(r.getAs[Long]("n_users") == n)
    def r12(d: Double) = BigDecimal(d).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val xs = users.map(u => per((u, "click")))
    val ys = users.map(u => per((u, "view")))
    val sx = xs.map(r12).sum.toDouble; val sy = ys.map(r12).sum.toDouble
    val sxx = xs.map(x => r12(x * x)).sum.toDouble
    val syy = ys.map(y => r12(y * y)).sum.toDouble
    val sxy = xs.zip(ys).map { case (x, y) => r12(x * y) }.sum.toDouble
    val (mx, my) = (sx / n, sy / n)
    val (vx, vy, cxy) = (sxx / n - mx * mx, syy / n - my * my, sxy / n - mx * my)
    val ccc = 2.0 * cxy / (vx + vy + (mx - my) * (mx - my))
    val pr = cxy / math.sqrt(vx * vy)
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("ccc") - r6(ccc)) < 1e-9)
    assert(math.abs(r.getAs[Double]("pearson_r") - r6(pr)) < 1e-9)
    assert(math.abs(r.getAs[Double]("ccc")) <=
      math.abs(r.getAs[Double]("pearson_r")) + 1e-9)
  }

  test("ks uniform: D matches a driver sorted-ECDF replay; the hash contract passes its own gate") {
    import spark.implicits._
    val r = Stats.ksUniformQ(spark, sfDir).collect().head
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(x: String): Long = {
      val hex = md.digest(x.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val us = graft.Tables.t(spark, sfDir, "orders")
      .select($"o_orderkey").collect().map(_.getLong(0))
      .map(k => (k, (h60(s"ksu:$k") + 1L).toDouble / 1152921504606846976L.toDouble))
      .sortBy { case (k, u) => (u, k) }.map(_._2)
    val n = us.length
    assert(r.getAs[Long]("n") == n)
    val d = us.zipWithIndex.map { case (u, i0) =>
      val i = i0 + 1
      math.max(i.toDouble / n - u, u - (i - 1).toDouble / n)
    }.max
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("d_stat") - r6(d)) < 1e-9)
    assert(math.abs(r.getAs[Double]("sqrt_n_d") - r6(math.sqrt(n.toDouble) * d)) < 1e-9)
    // the library-wide assumption: the seeded hash IS uniform
    assert(r.getAs[Int]("uniform_at_1pct") == 1,
      s"md5Long60 uniforms failed KS at 1%: sqrt(n)*D = ${r.getAs[Double]("sqrt_n_d")}")
  }

  test("kuiper: V = D+ + D- matches a driver sorted-ECDF replay; hash passes the gate") {
    import spark.implicits._
    val r = Stats.kuiperQ(spark, sfDir).collect().head
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(x: String): Long = {
      val hex = md.digest(x.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val us = graft.Tables.t(spark, sfDir, "orders")
      .select($"o_orderkey").collect().map(_.getLong(0))
      .map(k => (k, (h60(s"ksu:$k") + 1L).toDouble / 1152921504606846976L.toDouble))
      .sortBy { case (k, u) => (u, k) }.map(_._2)
    val n = us.length
    assert(r.getAs[Long]("n") == n)
    val dp = us.zipWithIndex.map { case (u, i0) => (i0 + 1).toDouble / n - u }.max
    val dm = us.zipWithIndex.map { case (u, i0) => u - i0.toDouble / n }.max
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("d_plus") - r6(dp)) < 1e-9)
    assert(math.abs(r.getAs[Double]("d_minus") - r6(dm)) < 1e-9)
    assert(math.abs(r.getAs[Double]("v_stat") - r6(dp + dm)) < 1e-9)
    val vstar = (dp + dm) * (math.sqrt(n.toDouble) + 0.155 + 0.24 / math.sqrt(n.toDouble))
    assert(math.abs(r.getAs[Double]("v_star") - r6(vstar)) < 1e-9)
    assert(r.getAs[Int]("uniform_at_1pct") == 1,
      s"md5Long60 uniforms failed Kuiper at 1%: V* = $vstar")
  }

  test("anderson-darling 2-sample: A2 matches a driver rank replay and sits near 1 under H0-ish data") {
    import spark.implicits._
    val r = Stats.adTwoSampleQ(spark, sfDir).collect().head
    val ev = graft.Tables.t(spark, sfDir, "events")
      .filter($"event_type".isin("click", "view"))
      .select($"event_id", $"event_type", $"value").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getDouble(2)))
      .sortBy { case (id, _, v) => (v, id) }
    val nn = ev.length
    val n1 = ev.count(_._2 == "click")
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == nn - n1)
    var mi = 0L
    var tsum = BigDecimal(0)
    ev.zipWithIndex.foreach { case ((_, tp, _), i0) =>
      val i = i0 + 1L
      if (tp == "click") mi += 1
      if (i < nn) {
        val num = BigDecimal(mi) * nn - BigDecimal(n1) * i
        val term = (num * num).toDouble / (i.toDouble * (nn - i))
        tsum += BigDecimal(term).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }
    }
    val a2 = tsum.toDouble / (n1.toDouble * (nn - n1))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("a2") - r6(a2)) < 1e-9,
      s"query ${r.getAs[Double]("a2")} vs replay $a2")
    // click and view values come from the same synthetic generator:
    // A2 should be near its H0 mean of 1, never in deep rejection
    assert(a2 > 0.0 && a2 < 10.0)
  }

  test("signed rank: W+ and z match a driver paired replay; W+ within its exact bounds") {
    import spark.implicits._
    val r = Stats.signedRankQ(spark, sfDir).collect().head
    val cells = graft.Tables.t(spark, sfDir, "events")
      .filter($"ts" < lit("2024-01-15").cast("timestamp")).collect()
      .map(x => ((x.getAs[Long]("user_id"),
        // UTC day number from epoch ms (session tz is UTC), 2024-01-01
        // is epoch day 19723 — avoids the JVM default-zone trap
        (Math.floorDiv(x.getAs[java.sql.Timestamp]("ts").getTime,
          86400000L) - 19723L).toInt / 7 + 1),
        BigDecimal(x.getAs[Double]("value")).setScale(2)))
      .groupBy(_._1).view
      .mapValues(vs => vs.map(_._2).sum.toDouble / vs.length).toMap
    val ds = cells.keySet.map(_._1).toSeq.distinct
      .flatMap { u =>
        (cells.get((u, 1)), cells.get((u, 2))) match {
          case (Some(a), Some(b)) if b - a != 0.0 => Some(u -> (b - a))
          case _ => None
        }
      }
    val n = ds.length
    assert(r.getAs[Long]("n") == n)
    val wPlus = ds.sortBy { case (u, d) => (math.abs(d), u) }.zipWithIndex
      .collect { case ((_, d), i) if d > 0 => (i + 1).toLong }.sum
    // w_plus leaves as DOUBLE since r14 (the DECIMAL(38,0) accumulator
    // — exact below 2⁵³, so the equality is still exact here)
    assert(r.getAs[Double]("w_plus") == wPlus.toDouble)
    val z = (wPlus.toDouble - n.toDouble * (n + 1) / 4) /
      math.sqrt(n.toDouble * (n + 1) * (2 * n + 1) / 24)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("z") - r6(z)) < 1e-9)
    assert(wPlus >= 0 && wPlus <= n.toLong * (n + 1) / 2)
  }

  test("grubbs: argmax and statistic match a driver per-nation replay") {
    import spark.implicits._
    val r = Stats.grubbsQ(spark, sfDir).collect().head
    val cn = graft.Tables.t(spark, sfDir, "customer")
      .select($"c_custkey", $"c_nationkey").collect()
      .map(x => (x.getAs[Number](0).longValue, x.getAs[Number](1).longValue))
      .toMap
    val nn = graft.Tables.t(spark, sfDir, "nation")
      .select($"n_nationkey", $"n_name").collect()
      .map(x => (x.getAs[Number](0).longValue, x.getString(1))).toMap
    val byNation = graft.Tables.t(spark, sfDir, "orders")
      .select($"o_custkey", $"o_totalprice").collect()
      .map(x => (nn(cn(x.getAs[Number](0).longValue)), BigDecimal(x.getDouble(1)).setScale(2)))
      .groupBy(_._1).view.mapValues { vs =>
        BigDecimal(vs.map(_._2).sum.toDouble / vs.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.toMap
    val k = byNation.size
    assert(r.getAs[Long]("k") == k)
    val sm = byNation.values.sum
    val sm2 = byNation.values.map(m => m * m).sum
    val xbar = sm.toDouble / k
    val sd = math.sqrt((sm2.toDouble - sm.toDouble * sm.toDouble / k) / (k - 1))
    val (outNation, outMean) = byNation.toSeq
      .sortBy { case (nm, m) => (-math.abs(m.toDouble - xbar), nm) }.head
    assert(r.getAs[String]("outlier_nation") == outNation)
    assert(r.getAs[Double]("outlier_mean") == outMean.toDouble)
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("g_stat") -
      r6(math.abs(outMean.toDouble - xbar) / sd)) < 1e-9)
    // Grubbs bound: G <= (k-1)/sqrt(k) always
    assert(r.getAs[Double]("g_stat") <= (k - 1) / math.sqrt(k.toDouble) + 1e-9)
  }

  test("dunn: pairwise z match a driver global-midrank replay; antisymmetry holds") {
    import spark.implicits._
    val rows = Stats.dunnQ(spark, sfDir).collect()
    assert(rows.length == 10)
    val ev = graft.Tables.t(spark, sfDir, "events")
      .select($"event_type", $"value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val n = ev.length
    // global midranks
    val byVal = ev.map(_._2).groupBy(identity).view.mapValues(_.length).toMap
    val sortedVals = byVal.keys.toSeq.sorted
    val rankOf = {
      var before = 0L
      sortedVals.map { v =>
        val t = byVal(v)
        val mid = before + (t + 1) / 2.0
        before += t
        v -> mid
      }.toMap
    }
    val ties = byVal.values.map(t => t.toLong * t * t - t).sum
    val types = Seq("click", "error", "purchase", "signup", "view")
    val rsum = types.map(tp => tp ->
      ev.filter(_._1 == tp).map(e => BigDecimal(rankOf(e._2))).sum).toMap
    val cnt = types.map(tp => tp -> ev.count(_._1 == tp)).toMap
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      val (na, nb) = (cnt(a), cnt(b))
      assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
      val ma = rsum(a).toDouble / na; val mb = rsum(b).toDouble / nb
      val vp = (n.toDouble * (n + 1) / 12.0 - ties / (12.0 * (n - 1.0))) *
        (1.0 / na + 1.0 / nb)
      assert(math.abs(r.getAs[Double]("mean_rank_a") - r6(ma)) < 1e-7)
      assert(math.abs(r.getAs[Double]("z") - r6((ma - mb) / math.sqrt(vp))) < 1e-5,
        s"$a/$b: ${r.getAs[Double]("z")} vs ${(ma - mb) / math.sqrt(vp)}")
    }
    // mean ranks average to the global mean rank (N+1)/2 weighted by n
    val wavg = types.map(tp => rsum(tp).toDouble).sum / n
    assert(math.abs(wavg - (n + 1) / 2.0) < 1e-6)
  }

  test("systematic: exact 1-in-20 rank rule matches a driver hash-order replay") {
    import spark.implicits._
    val rows = Stats.systematicQ(spark, sfDir).collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(x: String): Long = {
      val hex = md.digest(x.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val orders = graft.Tables.t(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_orderpriority", $"o_totalprice").collect()
      .map(r => (r.getLong(0), r.getString(1),
        BigDecimal(r.getDouble(2)).setScale(2)))
    val ranked = orders.sortBy { case (k, _, _) => (h60(s"sys:$k"), k) }
      .zipWithIndex.map { case ((k, pr, p), i) => (pr, p, (i + 1) % 20 == 1) }
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { r =>
      val pr = r.getAs[String]("o_orderpriority")
      val pop = ranked.filter(_._1 == pr)
      val samp = pop.filter(_._3)
      assert(r.getAs[Long]("n_pop") == pop.length)
      assert(r.getAs[Long]("n_samp") == samp.length)
      assert(math.abs(r.getAs[Double]("mean_pop") -
        r6(pop.map(_._2).sum.toDouble / pop.length)) < 1e-9)
      assert(math.abs(r.getAs[Double]("mean_samp") -
        r6(samp.map(_._2).sum.toDouble / samp.length)) < 1e-9)
      // systematic rate control: sample share within 3x of 1/20 per stratum
      assert(samp.length > 0 && samp.length < pop.length / 4)
    }
    // exact global rate: ceil(n/20)
    val nTot = orders.length
    assert(rows.map(_.getAs[Long]("n_samp")).sum == (nTot + 19) / 20)
  }

  test("friedman: tie-corrected statistic matches a driver midrank replay") {
    import spark.implicits._
    val row = Stats.friedmanQ(spark, sfDir).collect().head
    val types = Seq("click", "error", "purchase", "signup", "view")
    val k = types.size
    val cells = graft.Tables.t(spark, sfDir, "events").collect()
      .map(r => ((r.getAs[Long]("user_id"), r.getAs[String]("event_type")),
        BigDecimal(r.getAs[Double]("value")).setScale(2)))
      .groupBy(_._1).view.mapValues(vs =>
        vs.map(_._2).sum.toDouble / vs.length).toMap
    val users = cells.keySet.map(_._1)
      .filter(u => types.forall(tp => cells.contains((u, tp)))).toSeq.sorted
    assert(row.getAs[Long]("b") == users.length)
    // midranks within each user
    var a2 = BigDecimal(0)
    val rj = scala.collection.mutable.Map(types.map(_ -> BigDecimal(0)): _*)
    users.foreach { u =>
      val vs = types.map(tp => tp -> cells((u, tp)))
      vs.foreach { case (tp, v) =>
        val less = vs.count(_._2 < v); val eq = vs.count(_._2 == v)
        val mid = BigDecimal(2 * (less + 1) + eq - 1) / 2
        rj(tp) += mid; a2 += mid * mid
      }
    }
    val b = users.length
    val sumDev = types.map { tp =>
      val dev = rj(tp).toDouble - b.toDouble * (k + 1) / 2; dev * dev
    }.sum
    val tstat = (k - 1).toDouble * sumDev /
      (a2.toDouble - b.toDouble * k * (k + 1) * (k + 1) / 4)
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(row.getAs[Double]("t_stat") - r6(tstat)) < 1e-9,
      s"query ${row.getAs[Double]("t_stat")} vs replay $tstat")
  }

  test("adNumerator / rankDiffSq / wPlusSum stay exact past the int64 wrap point (VERDICT r13 item 1)") {
    import spark.implicits._
    // N = 5·10⁹ pooled events: mi·nn = 2·10¹⁹ wraps int64 (2⁶³ ≈
    // 9.2·10¹⁸) — the decimal-before-multiply path must return the
    // exact value a BigDecimal recompute gives.
    val mi = 4000000000L; val nn = 5000000000L
    val n1 = 2000000000L; val i = 3000000000L
    val row = Seq((mi, nn, n1, i)).toDF("mi", "nn", "n1", "i")
      .select(Stats.adNumerator($"mi", $"nn", $"n1", $"i").as("num"),
        Stats.rankDiffSq($"nn" - $"i").cast("double").as("sq"))
      .collect().head
    val exactNum = (BigDecimal(mi) * BigDecimal(nn)
      - BigDecimal(n1) * BigDecimal(i)).toDouble
    assert(row.getAs[Double]("num") == exactNum,
      s"adNumerator ${row.getAs[Double]("num")} vs exact $exactNum")
    val exactSq = (BigDecimal(nn - i) * BigDecimal(nn - i)).toDouble
    assert(row.getAs[Double]("sq") == exactSq)
    // W⁺ summing ranks near 2⁶²: two rows alone exceed Long.MaxValue
    val big = 5000000000000000000L // 5·10¹⁸
    val w = Seq((1.0, big), (2.0, big)).toDF("d", "rk")
      .agg(Stats.wPlusSum($"d", $"rk").cast("double").as("w"))
      .collect().head.getAs[Double]("w")
    assert(w == (BigDecimal(big) * 2).toDouble,
      s"wPlusSum $w vs ${(BigDecimal(big) * 2).toDouble}")
  }

  test("k-sample AD: A2, sigma, T match a driver Scholz-Stephens replay") {
    import spark.implicits._
    val r = Stats.adKSampleQ(spark, sfDir).collect().head
    val types = Seq("click", "error", "purchase", "signup", "view")
    val rows = graft.Tables.t(spark, sfDir, "events")
      .select($"event_id", $"event_type", $"value").collect()
      .map(x => (x.getAs[Long]("event_id"), x.getAs[String]("event_type"),
        x.getAs[Double]("value")))
      .sortBy(x => (x._3, x._1))
    val nN = rows.length
    assert(r.getAs[Long]("k") == types.length && r.getAs[Long]("n") == nN)
    val counts = types.map(tp => rows.count(_._2 == tp).toLong)
    // A2 (unrounded replay; per-term 9-dp rounding in the query shifts
    // the sum by < 1e-5 at this N)
    var a2 = 0.0
    types.zipWithIndex.foreach { case (tp, i) =>
      var m = 0L
      var ts = 0.0
      rows.zipWithIndex.foreach { case ((_, t2, _), j0) =>
        val j = j0 + 1L
        if (t2 == tp) m += 1
        if (j < nN) {
          val num = (BigDecimal(m) * nN - BigDecimal(counts(i)) * j).toDouble
          ts += num * num / (j.toDouble * (nN - j))
        }
      }
      a2 += ts / counts(i)
    }
    assert(math.abs(r.getAs[Double]("a2") - a2) < 1e-3,
      s"a2 ${r.getAs[Double]("a2")} vs replay $a2")
    // variance via the published h/g/H sums (unrounded harmonics)
    val k = types.length
    val bigH = counts.map(1.0 / _).sum
    val hh = (1 until nN).map(1.0 / _).sum
    val sCum = Array.ofDim[Double](nN + 1)
    (1 to nN).foreach(t => sCum(t) = sCum(t - 1) + 1.0 / t)
    val g = (1 to nN - 2).map(i => (sCum(nN - 1) - sCum(i)) / (nN - i)).sum
    val kk = k.toDouble
    val nd = nN.toDouble
    val va = (4 * g - 6) * (kk - 1) + (10 - 6 * g) * bigH
    val vb = (2 * g - 4) * kk * kk + 8 * hh * kk +
      (2 * g - 14 * hh - 4) * bigH - 8 * hh + 4 * g - 6
    val vc = (6 * hh + 2 * g - 2) * kk * kk + (4 * hh - 4 * g + 6) * kk +
      (2 * hh - 6) * bigH + 4 * hh
    val vd = (2 * hh + 6) * kk * kk - 4 * hh * kk
    val sigma = math.sqrt((va * nd * nd * nd + vb * nd * nd + vc * nd + vd) /
      ((nd - 1) * (nd - 2) * (nd - 3)))
    assert(math.abs(r.getAs[Double]("sigma") - sigma) < 1e-3,
      s"sigma ${r.getAs[Double]("sigma")} vs replay $sigma")
    val t = (a2 - (kk - 1)) / sigma
    assert(math.abs(r.getAs[Double]("t_stat") - t) < 1e-2,
      s"t ${r.getAs[Double]("t_stat")} vs replay $t")
  }
}
