package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Pii.signals on hand-built strings: per-class counts, redaction
  * placement, idempotence, and no cross-class bleed. */
class PiiSpec extends AnyFunSuite with SparkSpec {

  private def run(s: String): (Int, Int, Int, String) = {
    import spark.implicits._
    val (ne, np, ni, red) = Pii.signals($"t")
    val r = Seq(s).toDF("t")
      .select(ne.as("a"), np.as("b"), ni.as("c"), red.as("d")).head()
    (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3))
  }

  test("counts and redacts each class independently") {
    assert(run("mail a.b+c@ex-1.org now") == (1, 0, 0, "mail [EMAIL] now"))
    assert(run("call 555-123-4567.") == (0, 1, 0, "call [PHONE]."))
    assert(run("host 192.168.0.1 up") == (0, 0, 1, "host [IP] up"))
  }

  test("mixed text, multiple matches per class") {
    val (ne, np, ni, red) =
      run("a@b.io c@d.co 10.0.0.1 555-000-1111 x 555-222-3333")
    assert((ne, np, ni) == (2, 2, 1))
    assert(red == "[EMAIL] [EMAIL] [IP] [PHONE] x [PHONE]")
  }

  test("no matches leaves text untouched; redaction is idempotent") {
    val clean = "just words and numbers 12 34"
    assert(run(clean) == (0, 0, 0, clean))
    val once = run("a@b.io at 10.0.0.1")._4
    assert(run(once)._4 == once,
      "redacting already-redacted text must be a no-op")
  }

  test("word boundaries: digits embedded in longer tokens do not match") {
    val (ne, np, ni, _) = run("id 1555-123-45678 ver 1.2.3.4.5")
    assert(np == 0, "9-digit tail must not match the phone pattern")
    // 1.2.3.4.5 — the IP pattern's \b anchors still admit the leading
    // 4-octet prefix; this documents the known over-match of regex PII
    assert(ni == 1 && ne == 0)
  }

  test("k-anonymity: classes partition the table and k/l match a driver recount") {
    import spark.implicits._
    val got = Pii.kanonQ(spark, sfDir).collect()
      .map(r => (r.getAs[Int]("nationkey"), r.getAs[String]("segment")) ->
        (r.getAs[Long]("class_size"), r.getAs[Long]("l_diversity"),
          r.getAs[Boolean]("at_risk"))).toMap
    val rows = graft.Tables.t(spark, sfDir, "customer")
      .select($"c_nationkey", $"c_mktsegment", $"c_acctbal").collect()
      .map(r => ((r.getInt(0), r.getString(1)),
        math.floor(r.getDouble(2) / 1000).toLong))
    assert(got.values.map(_._1).sum == rows.length, "classes partition the table")
    rows.groupBy(_._1).foreach { case (qi, vs) =>
      val (k, l, risk) = got(qi)
      assert(k == vs.size, s"$qi size")
      assert(l == vs.map(_._2).distinct.size, s"$qi l-diversity")
      assert(risk == (vs.size < 15), s"$qi at-risk flag")
    }
  }

  test("dp mean: clipped-sum replay matches; released = true + noise/n; clip audit exact") {
    import spark.implicits._
    val rows = Pii.dpMeanQ(spark, sfDir).collect()
    val ev = graft.Tables.t(spark, sfDir, "events")
      .select($"event_type", $"user_id", $"value").collect()
      .map(r => (r.getString(0), r.getLong(1),
        (BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          * 100).toLongExact))
    def lapOf(tpe: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dpmean:$tpe".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(md.take(15), 16) % 1000000
        .toLong).toDouble.+(0.5) / 1000000.0
      if (u < 0.5) 100000.0 * math.log(u * 2.0)
      else -100000.0 * math.log((1.0 - u) * 2.0)
    }
    rows.foreach { r =>
      val tpe = r.getAs[String]("event_type")
      val totals = ev.filter(_._1 == tpe).groupBy(_._2)
        .map { case (_, xs) => xs.map(_._3).sum }.toSeq
      val clipped = totals.map(math.min(_, 100000L))
      val nClip = totals.count(_ > 100000L).toLong
      assert(r.getAs[Long]("n_users") == totals.size)
      assert(r.getAs[Long]("n_clipped") == nClip)
      assert(math.abs(r.getAs[Double]("true_mean")
        - clipped.sum.toDouble / totals.size / 100.0) < 1e-5)
      assert(math.abs(r.getAs[Double]("noise") - lapOf(tpe) / 100.0) < 1e-5)
      assert(math.abs(r.getAs[Double]("released_mean")
        - (clipped.sum + lapOf(tpe)) / totals.size / 100.0) < 1e-5)
      // released error is bounded by |noise|/n (the clip already inside true_mean)
      assert(math.abs(r.getAs[Double]("released_mean")
        - r.getAs[Double]("true_mean"))
        <= math.abs(r.getAs[Double]("noise")) / totals.size + 1e-5)
    }
  }

  test("suppression: primary/complementary marks match a driver replay; no nation leaks a single recoverable cell") {
    import spark.implicits._
    val rows = graft.ops.Pii.suppressQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val cells = graft.Tables.t(spark, sfDir, "customer")
      .join(graft.Tables.t(spark, sfDir, "nation"),
        $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name", $"c_mktsegment").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val nation = r.getAs[String]("nation")
      val g = cells(nation)
      val primary = g.filter(_._3 < 8)
      val comp =
        if (primary.length == 1)
          g.filter(_._3 >= 8).sortBy(c => (c._3, c._2)).take(1)
        else Array.empty[(String, String, Long)]
      assert(r.getAs[Long]("n_cells") == g.length)
      assert(r.getAs[Long]("n_primary") == primary.length, s"$nation primary")
      assert(r.getAs[Long]("n_complementary") == comp.length, s"$nation comp")
      val suppressed = (primary ++ comp).map(_._3).sum
      assert(r.getAs[Long]("suppressed_mass") == suppressed)
      assert(r.getAs[Long]("released_mass") == g.map(_._3).sum - suppressed)
      // the invariant the rule exists for: never exactly one suppressed cell
      assert(primary.length + comp.length != 1, s"$nation leaks one cell")
    }
  }

  test("ldiv: entropy and recursive (3,2)-diversity match a driver recompute") {
    import spark.implicits._
    val rows = Pii.ldivQ(spark, sfDir).collect()
    val cust = graft.Tables.t(spark, sfDir, "customer")
      .select($"c_nationkey", $"c_acctbal", $"c_mktsegment").collect()
      .map(r => ((r.getInt(0), math.floor(r.getDouble(1) / 2000.0).toLong),
        r.getString(2)))
    val byClass = cust.groupBy(_._1)
    assert(rows.length == byClass.size)
    def r12(d: Double): Double =
      BigDecimal(d).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { r =>
      val key = (r.getAs[Int]("nationkey"), r.getAs[Long]("band"))
      val segs = byClass(key).map(_._2)
      val counts = segs.groupBy(identity).view.mapValues(_.size).values.toSeq
      val n = counts.sum
      assert(r.getAs[Long]("n") == n, s"$key n")
      assert(r.getAs[Long]("l_distinct") == counts.size, s"$key l")
      val r1 = counts.max
      assert(r.getAs[Long]("r1") == r1, s"$key r1")
      assert(r.getAs[Int]("rec_3_2") == (if (r1 < 3 * (n - r1)) 1 else 0))
      val h = counts.map { c =>
        val f = c.toDouble / n
        BigDecimal(r12(-(f * math.log(f))))
      }.sum.toDouble
      assert(math.abs(r.getAs[Double]("entropy") -
        BigDecimal(h).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        < 1e-9, s"$key entropy")
      assert(r.getAs[Int]("entropy_2") ==
        (if (h >= math.log(2.0)) 1 else 0), s"$key entropy flag")
      // entropy ≤ ln(l_distinct): uniform is the max-entropy split
      assert(h <= math.log(counts.size.toDouble) + 1e-9, s"$key bound")
    }
  }

  test("dp quantile: winner matches a driver Gumbel-argmax replay; release near the true median") {
    import spark.implicits._
    val r = Pii.dpQuantileQ(spark, sfDir).collect().head
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(x: String): Long = {
      val hex = md.digest(x.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val vals = graft.Tables.t(spark, sfDir, "orders")
      .select($"o_totalprice").collect()
      .map(x => BigDecimal(x.getDouble(0)).setScale(2))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy(_._1)
    val n = vals.map(_._2).sum
    assert(r.getAs[Long]("n") == n)
    // true lower median
    var cum = 0L
    val tm = vals.find { case (_, c) => cum += c; cum >= (n + 1) / 2 }.get._1
    assert(r.getAs[Double]("true_median") == tm.toDouble)
    // interval argmax replay
    var best = Double.NegativeInfinity; var bestMid = 0.0; var bestMiss = 0L
    cum = 0L
    vals.zip(vals.tail).foreach { case ((v, c), (vn, _)) =>
      cum += c
      val u = ((h60(s"dpq:$v") % 1000000L).toDouble + 0.5) / 1000000.0
      val util = -math.abs(cum.toDouble - n.toDouble / 2)
      val key = math.log((vn - v).toDouble) + 0.5 * util + -math.log(-math.log(u))
      if (key > best) {
        best = key
        bestMid = ((v + vn) / 2).toDouble
        bestMiss = math.abs(cum.toDouble - n.toDouble / 2).toLong
      }
    }
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("released") == r6(bestMid),
      s"released ${r.getAs[Double]("released")} vs replay $bestMid")
    assert(r.getAs[Long]("rank_miss") == bestMiss)
    // utility promise at eps=1, n~thousands: release lands well inside
    // the distribution (rank miss a small fraction of n)
    assert(bestMiss < n / 4, s"rank miss $bestMiss of $n")
  }
}
