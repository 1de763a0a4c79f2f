package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Driver-side recomputes for the r10 session additions: CCNet
  * bucketing, kNN label-noise, Katz centrality, t-closeness, Hurst
  * R/S, and the AR(2) backtest — each statistic re-derived in plain
  * Scala on collected sf0.001 inputs, independent of both the Spark
  * plan and the DuckDB oracle. */
class CurationAuditSpec extends AnyFunSuite with SparkSpec {

  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("ccnet: tiers partition the scored corpus per lang and mean CE is monotone head<=middle<=tail") {
    import spark.implicits._
    val rows = Curate.ccnetQ(spark, sfDir).collect()
    val scored = Text.ceAll(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == scored,
      "tier doc counts must cover every doc that carries a CE")
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val byTier = rs.map(r => r.getAs[String]("tier") -> r.getAs[Double]("mean_ce")).toMap
      for (a <- byTier.get("head"); b <- byTier.get("middle"))
        assert(a <= b, s"$lang head>middle")
      for (b <- byTier.get("middle"); c <- byTier.get("tail"))
        assert(b <= c, s"$lang middle>tail")
      rs.foreach(r => assert(r.getAs[Long]("char_mass") > 0))
    }
  }

  test("ccnet scale path: approx-percentile cutoffs reproduce the exact NTILE tiers almost everywhere") {
    import spark.implicits._
    // the documented 100 TB form: two approx_percentile cutpoints per
    // language + a broadcast cutoff join — no per-lang global sort
    val ce = Text.ceAll(spark, sfDir).select($"doc_id", $"cross_entropy")
    val slim = graft.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", $"lang").join(ce, Seq("doc_id"))
    val cuts = slim.groupBy($"lang")
      .agg(expr("percentile_approx(cross_entropy, array(0.3333333, 0.6666667), 10000)").as("c"))
      .select($"lang", $"c"(0).as("c1"), $"c"(1).as("c2"))
    val approx = slim.join(org.apache.spark.sql.functions.broadcast(cuts), Seq("lang"))
      .withColumn("tier",
        when($"cross_entropy" <= $"c1", "head")
          .when($"cross_entropy" <= $"c2", "middle").otherwise("tail"))
      .groupBy($"lang", $"tier").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val exact = Curate.ccnetQ(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("tier")) ->
        r.getAs[Long]("n_docs")).toMap
    // per (lang, tier) the two paths may disagree only at cut boundaries
    // (ties / approx error) — bound the disagreement to 10% of the tier
    exact.foreach { case (k, n) =>
      val a = approx.getOrElse(k, 0L)
      assert(math.abs(a - n) <= math.max(2L, n / 10),
        s"$k exact=$n approx=$a — cutoff path diverged beyond boundary noise")
    }
  }

  test("label noise: probe accounting exact, bp fields bounded, flags match a driver kNN recompute") {
    import spark.implicits._
    val rows = LabelNoise.noiseQ(spark, sfDir).collect()
    val e = graft.Tables.t(spark, sfDir, "embeddings")
      .select($"vec_id", $"label", $"embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def h(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }
    val probes = e.sortBy(x => (h(x._1.toString), x._1)).take(100)
    assert(rows.map(_.getAs[Long]("n_probes")).sum == probes.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("noise_bp") >= 0 && r.getAs[Long]("noise_bp") <= 10000)
      assert(r.getAs[Long]("agree_bp") >= 0 && r.getAs[Long]("agree_bp") <= 10000)
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val flaggedByLabel = probes.map { case (pid, own, pv) =>
      val top = e.filter(_._1 != pid)
        .map { case (vid, lb, v) => (vid, lb, cos(pv, v)) }
        .sortBy { case (vid, _, c) => (-c, vid) }.take(5)
      val pred = top.groupBy(_._2).view.mapValues(_.length).toSeq
        .sortBy { case (lb, c) => (-c, lb) }.head._1
      (own, if (pred != own) 1L else 0L,
        top.count(_._2 == own).toLong)
    }.groupBy(_._1)
    rows.foreach { r =>
      val lb = r.getAs[Int]("label")
      val g = flaggedByLabel(lb)
      assert(r.getAs[Long]("n_probes") == g.length)
      assert(r.getAs[Long]("n_flagged") == g.map(_._2).sum,
        s"label $lb flags disagree with driver kNN")
      assert(r.getAs[Long]("agree_bp") ==
        10000L * g.map(_._3).sum / (5L * g.length))
    }
  }

  test("katz: matches a driver power-series recompute under the 9-dp contract") {
    import spark.implicits._
    val got = Graph.katzQ(spark, sfDir).collect()
      .map(r => r.getAs[String]("nation") -> r.getAs[Double]("katz")).toMap
    val edges = got.keySet // ensure non-empty result first
    assert(edges.nonEmpty)
    // rebuild the distinct nation->nation edge list
    val e = graft.Tables.t(spark, sfDir, "lineitem")
      .join(graft.Tables.t(spark, sfDir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(graft.Tables.t(spark, sfDir, "customer"), $"o_custkey" === $"c_custkey")
      .join(graft.Tables.t(spark, sfDir, "nation").select($"n_nationkey", $"n_name".as("cn")),
        $"c_nationkey" === $"n_nationkey")
      .join(graft.Tables.t(spark, sfDir, "supplier"), $"l_suppkey" === $"s_suppkey")
      .join(graft.Tables.t(spark, sfDir, "nation").select($"n_nationkey".as("sk"), $"n_name".as("sn")),
        $"s_nationkey" === $"sk")
      .select($"cn", $"sn").distinct().collect()
      .map(r => (r.getString(0), r.getString(1)))
    val nodes = graft.Tables.t(spark, sfDir, "nation")
      .select($"n_name").collect().map(_.getString(0))
    var k = nodes.map(_ -> 0.0).toMap
    for (_ <- 1 to 6) {
      val mass = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) =>
          BigDecimal(round9(0.03 * (1.0 + k(src))))
        }.sum.toDouble
      }
      k = nodes.map(n => n -> mass.getOrElse(n, 0.0)).toMap
    }
    nodes.foreach { n =>
      assert(math.abs(got(n) - k(n)) < 1e-12,
        s"$n katz ${got(n)} vs recompute ${k(n)}")
    }
  }

  test("tclose: class sizes cover the table, EMD bounded and equal to a driver recompute") {
    import spark.implicits._
    val rows = Pii.tcloseQ(spark, sfDir).collect()
    val cust = graft.Tables.t(spark, sfDir, "customer")
      .select($"c_nationkey", $"c_mktsegment",
        floor($"c_acctbal" / 1000).cast("long")).collect()
      .map(r => (r.getInt(0).toLong, r.getString(1), r.getLong(2)))
    assert(rows.map(_.getAs[Long]("class_size")).sum == cust.length)
    val bands = cust.map(_._3).distinct.sorted
    val n = cust.length.toLong
    val globalCum = bands.map(b => b -> cust.count(_._3 <= b).toLong).toMap
    rows.foreach { r =>
      val emd = r.getAs[Double]("emd")
      assert(emd >= 0.0 && emd <= 1.0)
      val nk = r.getAs[Int]("nationkey").toLong
      val seg = r.getAs[String]("segment")
      val cls = cust.filter(c => c._1 == nk && c._2 == seg)
      val nc = cls.length.toLong
      val num = bands.dropRight(1).map { b =>
        math.abs(n * cls.count(_._3 <= b).toLong - nc * globalCum(b))
      }.sum
      val expect = BigDecimal(num.toDouble / (nc * n * (bands.length - 1)).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(emd - expect) < 1e-9, s"class ($nk,$seg)")
    }
  }

  test("hurst: R/S means match a driver recompute and H is the 4-point log-log slope") {
    import spark.implicits._
    val row = TimeSeries.hurstQ(spark, sfDir).collect().head
    val hourly = graft.Tables.t(spark, sfDir, "events")
      .groupBy(date_trunc("hour", $"ts").as("hour")).count()
      .collect().map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
    val start = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
    val xs = (0 until 720).map(i => hourly.getOrElse(start + i * 3600000L, 0L))
    def meanRS(n: Int): Double = {
      val rss = xs.grouped(n).filter(_.length == n).flatMap { blk =>
        val s = blk.sum
        val q = blk.map(x => x * x).sum
        if (n * q - s * s <= 0) None
        else {
          val zn = blk.indices.map { j =>
            n * blk.take(j + 1).sum - (j + 1).toLong * s
          }
          Some(round9((zn.max - zn.min).toDouble /
            math.sqrt((n * q - s * s).toDouble)))
        }
      }.toSeq
      rss.map(BigDecimal(_)).sum.toDouble / rss.length
    }
    val exp = Map(8 -> meanRS(8), 16 -> meanRS(16), 32 -> meanRS(32), 64 -> meanRS(64))
    for ((nm, n) <- Seq("rs8" -> 8, "rs16" -> 16, "rs32" -> 32, "rs64" -> 64)) {
      assert(math.abs(row.getAs[Double](nm) -
        BigDecimal(exp(n)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"$nm mismatch")
    }
    val ys = Seq(8, 16, 32, 64).map(n => round9(math.log(exp(n))))
    val h = (-1.5 * ys(0) + -0.5 * ys(1) + 0.5 * ys(2) + 1.5 * ys(3)) /
      (5 * 0.6931471805599453)
    assert(math.abs(row.getAs[Double]("hurst") - h) < 1e-6)
    assert(row.getAs[Double]("hurst") > 0.0 && row.getAs[Double]("hurst") < 1.5)
  }

  test("nn radius: matches a brute-force within-radius argmin over all collected points") {
    import spark.implicits._
    val got = Spatial.nnRadiusQ(spark, sfDir).collect()
      .map(r => r.getAs[Long]("id") -> (r.getAs[Long]("nn_id"), r.getAs[Long]("dist2_h2"))).toMap
    val pts = graft.Tables.t(spark, sfDir, "customer")
      .select($"c_custkey").collect().map(_.getLong(0)).map { id =>
      def h(s: String): Long = {
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8"))
        val hex = md.take(8).map("%02x".format(_)).mkString.take(15)
        java.lang.Long.parseLong(hex, 16)
      }
      (id, h(s"$id:x") % 9000, h(s"$id:y") % 9000)
    }
    val expect = pts.flatMap { case (id, x, y) =>
      val cands = pts.filter(_._1 != id).map { case (i2, x2, y2) =>
        (i2, (x - x2) * (x - x2) + (y - y2) * (y - y2))
      }.filter(_._2 <= 10000L)
      if (cands.isEmpty) None
      else Some(id -> cands.minBy { case (i2, d2) => (d2, i2) })
    }.toMap
    assert(got == expect, s"got ${got.size} rows, expected ${expect.size}")
  }

  test("png header: byte-offset parse agrees with the real codec decode on every planted image") {
    import spark.implicits._
    val hdr = Multimodal.pngHeaderQ(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("width"), r.getAs[Long]("height"),
          r.getAs[Long]("bit_depth"), r.getAs[Long]("color_type"),
          r.getAs[Boolean]("sig_ok"))).toMap
    assert(hdr.nonEmpty)
    hdr.foreach { case (id, (w, h, bd, ct, sig)) =>
      assert(sig, s"doc $id signature")
      assert(w == 8 + id % 13 && h == 8 + id % 11, s"doc $id dims")
      assert(bd == 8 && ct == 2, s"doc $id depth/color")
    }
    // cross-check against the full-codec path on the same payloads
    val dec = Multimodal.decodeQ(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("width"), r.getAs[Long]("height"))).toMap
    assert(dec.keySet == hdr.keySet)
    dec.foreach { case (id, (w, h)) =>
      assert(hdr(id)._1 == w && hdr(id)._2 == h, s"doc $id codec mismatch")
    }
  }

  test("meta: pooled lift, SE, Q and I2 match a driver inverse-variance recompute") {
    import spark.implicits._
    val row = Stats.metaQ(spark, sfDir).collect().head
    val ev = graft.Tables.t(spark, sfDir, "events")
      .select($"event_type", $"user_id", $"value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val strata = ev.groupBy(_._1).values.flatMap { es =>
      val a = es.filter(_._2 % 2 == 1); val b = es.filter(_._2 % 2 == 0)
      val (na, nb) = (a.length.toLong, b.length.toLong)
      val (xa, xb) = (a.count(_._3 > 50.0).toLong, b.count(_._3 > 50.0).toLong)
      val pa = xa.toDouble / na; val pb = xb.toDouble / nb
      val d = pb - pa
      val v = pa * (1 - pa) / na + pb * (1 - pb) / nb
      if (v > 0) Some((d, v)) else None
    }.toSeq
    val sw = strata.map(x => BigDecimal(round9(1 / x._2))).sum
    val swd = strata.map(x => BigDecimal(round9(x._1 / x._2))).sum
    val pooled = round9(swd.toDouble / sw.toDouble)
    val q = strata.map { case (d, v) =>
      BigDecimal(round9(round9(1 / v) * (d - pooled) * (d - pooled)))
    }.sum.toDouble
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Long]("k") == strata.length)
    assert(math.abs(row.getAs[Double]("pooled_lift") - r6(pooled)) < 1e-9)
    assert(math.abs(row.getAs[Double]("se") - r6(1 / math.sqrt(sw.toDouble))) < 1e-9)
    assert(math.abs(row.getAs[Double]("q_stat") - r6(q)) < 1e-9)
    val i2 = if (q > 0) math.max(0.0, (q - (strata.length - 1)) / q) else 0.0
    assert(math.abs(row.getAs[Double]("i2") - r6(i2)) < 1e-9)
  }

  test("lift: deciles equal a driver NTILE replay and the last cumulative gain is exactly 10000 bp") {
    import spark.implicits._
    val rows = Classify.liftQ(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("decile")).toSeq == (1 to 10))
    assert(rows.last.getAs[Long]("gain_bp") == 10000L)
    val sc = Classify.scored(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"), r.getAs[Long]("y")))
      .sortBy { case (id, s, _) => (-s, id) }
    val n = sc.length
    val base = n / 10; val extra = n % 10
    var off = 0
    val expect = (1 to 10).map { d =>
      val sz = base + (if (d <= extra) 1 else 0)
      val slice = sc.slice(off, off + sz); off += sz
      (d, sz.toLong, slice.map(_._3).sum)
    }
    rows.zip(expect).foreach { case (r, (d, sz, pos)) =>
      assert(r.getAs[Int]("decile") == d)
      assert(r.getAs[Long]("n") == sz, s"decile $d size")
      assert(r.getAs[Long]("n_pos") == pos, s"decile $d positives")
    }
    val tp = expect.map(_._3).sum
    var cum = 0L
    rows.zip(expect).foreach { case (r, (d, sz, pos)) =>
      cum += pos
      assert(r.getAs[Long]("cum_pos") == cum)
      assert(r.getAs[Long]("gain_bp") == 10000L * cum / tp)
      assert(r.getAs[Long]("lift_bp") == 10000L * pos * n / (sz * tp), s"decile $d lift")
    }
  }

  test("granger: 20 ordered pairs, partial correlation bounded, F matches a driver recompute for one pair") {
    import spark.implicits._
    val rows = Stats.grangerQ(spark, sfDir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("r_partial")) <= 1.0)
      assert(r.getAs[Long]("n") == 719)
      assert(r.getAs[Double]("f_stat") >= 0.0)
    }
    val r0 = rows.head
    val (et, ct) = (r0.getAs[String]("effect_type"), r0.getAs[String]("cause_type"))
    def seriesOf(t0: String): IndexedSeq[Long] = {
      val hourly = graft.Tables.t(spark, sfDir, "events")
        .filter($"event_type" === t0)
        .groupBy(date_trunc("hour", $"ts").as("hour")).count()
        .collect().map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
      val start = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
      (0 until 720).map(i => hourly.getOrElse(start + i * 3600000L, 0L))
    }
    val xs = seriesOf(et); val zs = seriesOf(ct)
    val rows3 = (1 until 720).map(i => (xs(i), xs(i - 1), zs(i - 1)))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def pear(f: ((Long, Long, Long)) => Long, g: ((Long, Long, Long)) => Long): Double = {
      val n = rows3.length.toLong
      val sa = rows3.map(f).sum; val sb = rows3.map(g).sum
      val saa = rows3.map(t => f(t) * f(t)).sum
      val sbb = rows3.map(t => g(t) * g(t)).sum
      val sab = rows3.map(t => f(t) * g(t)).sum
      r6((n * sab - sa * sb).toDouble /
        math.sqrt((n * saa - sa * sa).toDouble * (n * sbb - sb * sb).toDouble))
    }
    val (r1, r2, r3) = (pear(_._1, _._2), pear(_._1, _._3), pear(_._2, _._3))
    val rp = round9((r2 - r1 * r3) / math.sqrt((1 - r1 * r1) * (1 - r3 * r3)))
    val f = r6((719 - 3) * rp * rp / (1 - rp * rp))
    assert(math.abs(r0.getAs[Double]("r_partial") - r6(rp)) < 1e-9)
    assert(math.abs(r0.getAs[Double]("f_stat") - f) < 1e-9)
  }

  test("croston: fold equals a sequential driver replay and demand counts match the nonzero hours") {
    import spark.implicits._
    val rows = TimeSeries.crostonQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val start = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
    rows.foreach { r =>
      val t0 = r.getAs[String]("event_type")
      val hourly = graft.Tables.t(spark, sfDir, "events")
        .filter($"event_type" === t0 && $"value" > 120.0)
        .groupBy(date_trunc("hour", $"ts").as("hour")).count()
        .collect().map(x => x.getTimestamp(0).getTime -> x.getLong(1)).toMap
      val xs = (0 until 720).map(i => hourly.getOrElse(start + i * 3600000L, 0L).toDouble)
      var z = 0.0; var p = 0.0; var q = 0.0; var started = false; var nd = 0L
      xs.foreach { x =>
        if (x > 0.0) {
          if (started) { z = z + 0.1 * (x - z); p = p + 0.1 * ((q + 1.0) - p) }
          else { z = x; p = q + 1.0; started = true }
          q = 0.0; nd += 1
        } else q += 1.0
      }
      def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Long]("n_demands") == nd, s"$t0 demand count")
      assert(math.abs(r.getAs[Double]("demand_size") - r6(z)) < 1e-9, s"$t0 size")
      assert(math.abs(r.getAs[Double]("demand_interval") - r6(p)) < 1e-9, s"$t0 interval")
      assert(math.abs(r.getAs[Double]("forecast_per_hour") - r6(z / p)) < 1e-9, s"$t0 forecast")
    }
  }

  test("ivf sensitivity: theorem gates hold and the full-probe search is exactly brute force") {
    import spark.implicits._
    val rows = Similarity.ivfSensitivityQ(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("nprobe")).toSeq == Seq(1, 2, 4, 8, 16))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_queries") == 10)
      assert(r.getAs[Boolean]("monotone_ok"), s"nprobe ${r.getAs[Int]("nprobe")}")
      assert(r.getAs[Boolean]("full_probe_exact"))
    }
    // the high end of the dial keeps useful recall (the registered gate's spirit)
    val exact = Similarity.topk(spark, sfDir).select($"query_id", $"vec_id")
    val hits8 = Similarity.annIvf(spark, sfDir, nProbe = 8)
      .select($"query_id", $"vec_id")
      .join(exact, Seq("query_id", "vec_id")).count()
    assert(hits8 >= 50, s"recall@8 probes collapsed: $hits8/100 exact hits")
  }

  test("mtld: fold equals a sequential driver replay on every returned doc") {
    import spark.implicits._
    val rows = Text.mtldQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val texts = graft.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", lower($"text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    def factors(toks: Seq[String]): Double = {
      var f = 0.0; var seen = List.empty[String]; var cnt = 0
      toks.foreach { tk =>
        val seen2 = if (seen.contains(tk)) seen else seen :+ tk
        val cnt2 = cnt + 1
        if (100 * seen2.length < 72 * cnt2) { f += 1.0; seen = Nil; cnt = 0 }
        else { seen = seen2; cnt = cnt2 }
      }
      if (cnt > 0) f += (1.0 - seen.length / cnt.toDouble) / 0.28
      f
    }
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { r =>
      val toks = texts(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_toks") == toks.length)
      val ff = factors(toks); val fb = factors(toks.reverse)
      assert(math.abs(r.getAs[Double]("factors_fwd") - r6(ff)) < 1e-9)
      if (ff > 0 && fb > 0)
        assert(math.abs(r.getAs[Double]("mtld") -
          r6((toks.length / ff + toks.length / fb) / 2.0)) < 1e-9)
    }
  }

  test("tost: counts and all three z statistics match a driver recompute, verdicts self-consistent") {
    import spark.implicits._
    val r = Stats.tostQ(spark, sfDir).collect().head
    val ev = graft.Tables.t(spark, sfDir, "events")
      .select($"user_id", $"value").collect()
      .map(x => (x.getLong(0), x.getDouble(1)))
    val a = ev.filter(_._1 % 2 == 1); val b = ev.filter(_._1 % 2 == 0)
    val (na, nb) = (a.length.toLong, b.length.toLong)
    val pa = a.count(_._2 > 50.0).toDouble / na
    val pb = b.count(_._2 > 50.0).toDouble / nb
    val d = pb - pa
    val se = math.sqrt(pa * (1 - pa) / na + pb * (1 - pb) / nb)
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
    assert(math.abs(r.getAs[Double]("z_diff") - r6(d / se)) < 1e-9)
    assert(math.abs(r.getAs[Double]("z_low") - r6((d + 0.02) / se)) < 1e-9)
    assert(math.abs(r.getAs[Double]("z_high") - r6((d - 0.02) / se)) < 1e-9)
    assert(r.getAs[Boolean]("equivalent") ==
      ((d + 0.02) / se > 1.644854 && (d - 0.02) / se < -1.644854))
    assert(r.getAs[Boolean]("different") == (math.abs(d / se) > 1.959964))
  }

  test("ar2: backtest covers the last 120 hours and phis obey the Yule-Walker identities from the series ACF") {
    import spark.implicits._
    val rows = TimeSeries.ar2Q(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_test") == 120)
      assert(r.getAs[Double]("mae_ar2") >= 0.0)
      assert(r.getAs[Double]("mae_naive") >= 0.0)
    }
    // recompute phi1/phi2 for the first event type from its dense series
    val t0 = rows.head.getAs[String]("event_type")
    val hourly = graft.Tables.t(spark, sfDir, "events")
      .filter($"event_type" === t0)
      .groupBy(date_trunc("hour", $"ts").as("hour")).count()
      .collect().map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
    val start = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
    val xs = (0 until 720).map(i => hourly.getOrElse(start + i * 3600000L, 0L))
    def pearson(lagK: Int): Double = {
      val pairs = xs.drop(lagK).zip(xs.dropRight(lagK))
      val n = pairs.length.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      BigDecimal((n * sxy - sx * sy).toDouble /
        math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val (r1, r2) = (pearson(1), pearson(2))
    val phi1 = round9(r1 * (1 - r2) / (1 - r1 * r1))
    val phi2 = round9((r2 - r1 * r1) / (1 - r1 * r1))
    val got = rows.head
    assert(math.abs(got.getAs[Double]("phi1") -
      BigDecimal(phi1).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(got.getAs[Double]("phi2") -
      BigDecimal(phi2).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("softdedup: soft/hard masses match a driver recompute; beta=1 recovers cluster count") {
    import spark.implicits._
    val rows = Curate.softdedupQ(spark, sfDir).collect()
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", $"source", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val crawl = docs ++ docs.filter(_._1 % 5 == 0)
      .map(d => (d._1 + 4000000L, d._2, d._3.toUpperCase.replace(" ", "  ")))
    def norm(t: String): String =
      java.text.Normalizer.normalize(
        t.toLowerCase.replaceAll("\\s+", " ").trim,
        java.text.Normalizer.Form.NFC)
    val sizes = crawl.groupBy(d => norm(d._3)).view.mapValues(_.size).toMap
    val bySource = crawl.groupBy(_._2)
    def r12(d: Double) = BigDecimal(d).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows.map(_.getAs[String]("source")).toSet == bySource.keySet)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val ds = bySource(src)
      val cs = ds.map(d => sizes(norm(d._3)))
      assert(r.getAs[Long]("n_docs") == ds.length, s"$src n")
      assert(r.getAs[Long]("n_dup_docs") == cs.count(_ >= 2), s"$src dups")
      val hard = cs.map(c => r12(1.0 / c)).sum.toDouble
      val soft = cs.map(c => r12(math.pow(c.toDouble, -0.5))).sum.toDouble
      assert(math.abs(r.getAs[Double]("hard_mass") - r6(hard)) < 1e-9, s"$src hard")
      assert(math.abs(r.getAs[Double]("soft_mass") - r6(soft)) < 1e-9, s"$src soft")
      // beta ordering: hard (beta=1) <= soft (beta=0.5) <= raw count
      assert(hard <= soft + 1e-9 && soft <= ds.length + 1e-9, s"$src order")
      assert(r.getAs[Long]("soft_bp") == math.floor(10000.0 * soft / ds.length).toLong)
    }
    // global sanity: summing per-cluster 1/c over members counts clusters
    val globalHard = crawl.map(d => 1.0 / sizes(norm(d._3))).sum
    assert(math.abs(globalHard - sizes.size) < 1e-6)
  }
}
