package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class BehaviorSpec extends AnyFunSuite with SparkSpec {

  test("retention: offset-0 is the cohort itself; later offsets never exceed it") {
    import spark.implicits._
    val rows = Behavior.retentionQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getAs[Int]("cohort_week"))
    byCohort.foreach { case (cw, rs) =>
      val zero = rs.find(_.getAs[Int]("week_offset") == 0)
      assert(zero.isDefined, s"cohort $cw missing offset 0")
      // week-0 activity is what DEFINES cohort membership
      assert(zero.get.getAs[Long]("n_active") ==
        zero.get.getAs[Long]("cohort_n"))
      rs.foreach(r => assert(r.getAs[Long]("n_active") <=
        r.getAs[Long]("cohort_n"), s"cohort $cw over 100%"))
    }
    // cohorts partition the user base
    val users = graft.Tables.t(spark, sfDir, "events")
      .select($"user_id").distinct().count()
    assert(byCohort.values.map(
      _.head.getAs[Long]("cohort_n")).sum == users)
  }

  test("transitions: rows partition consecutive pairs; probabilities sum to ~1 per source") {
    import spark.implicits._
    val rows = Behavior.transitionsQ(spark, sfDir).collect()
    val ev = graft.Tables.t(spark, sfDir, "events")
    val nEvents = ev.count()
    val nUsers = ev.select($"user_id").distinct().count()
    // each user's k events contribute exactly k-1 transitions
    assert(rows.map(_.getAs[Long]("n")).sum == nEvents - nUsers)
    rows.groupBy(_.getAs[String]("src")).foreach { case (src, rs) =>
      // basis points from floor division: per-source sum lands in
      // (10000 - |dst|, 10000] — each floor drops strictly less than 1 bp
      val bp = rs.map(_.getAs[Long]("p_bp")).sum
      assert(bp > 10000 - rs.length && bp <= 10000,
        s"src $src p_bp sums to $bp over ${rs.length} cells")
    }
  }

  test("attribution: purchases conserved, revenue conserved, channels from the touch set") {
    import spark.implicits._
    val rows = Behavior.attributionQ(spark, sfDir).collect()
    val purchases = graft.Tables.t(spark, sfDir, "events")
      .filter($"event_type" === "purchase")
    assert(rows.map(_.getAs[Long]("n_purchases")).sum == purchases.count())
    val total = purchases
      .agg(org.apache.spark.sql.functions.sum(
        $"value".cast("decimal(18,2)"))).head.getDecimal(0)
    val attributed = rows
      .map(r => BigDecimal(r.getAs[Double]("revenue")).setScale(2,
        BigDecimal.RoundingMode.HALF_UP))
      .sum
    assert(attributed == BigDecimal(total),
      s"revenue $attributed != $total")
    val channels = rows.map(_.getAs[String]("channel")).toSet
    assert(channels.subsetOf(Set("click", "view", "none")))
  }

  test("kappa: 2x2 table conserves docs; po/kappa recompute from the cells") {
    val r = graft.ops.Text.kappaQ(spark, sfDir).collect().head
    val (n11, n10, n01, n00) = (r.getAs[Long]("n11"), r.getAs[Long]("n10"),
      r.getAs[Long]("n01"), r.getAs[Long]("n00"))
    val n = n11 + n10 + n01 + n00
    assert(n == graft.Tables.t(spark, sfDir, "documents").count())
    val po = (n11 + n00).toDouble / n
    val pe = ((n11 + n10) * (n11 + n01) +
      (n01 + n00) * (n10 + n00)).toDouble / (n * n)
    val kappa = r.getAs[Double]("kappa")
    assert(math.abs(kappa - (po - pe) / (1 - pe)) < 1e-6)
    assert(kappa >= -1.0 && kappa <= 1.0)
  }

  test("skew report: exact cardinalities, ordered quantile ladder, share floor") {
    import spark.implicits._
    val r = Skew.skewReportQ(spark, sfDir).collect().head
    val orders = graft.Tables.t(spark, sfDir, "orders")
    assert(r.getAs[Long]("n_keys") ==
      orders.select($"o_custkey").distinct().count())
    assert(r.getAs[Long]("total_rows") == orders.count())
    val (p50, p90, p99) = (r.getAs[Double]("p50"), r.getAs[Double]("p90"),
      r.getAs[Double]("p99"))
    assert(p50 <= p90 && p90 <= p99 && p99 <= r.getAs[Long]("max_n"))
    assert(r.getAs[Double]("top_share") >= 1.0 / r.getAs[Long]("n_keys"))
    assert(r.getAs[Double]("skew_factor") >= 1.0)
  }

  test("ks: statistic matches a driver-side two-sample recompute") {
    import spark.implicits._
    val r = Drift.ksQ(spark, sfDir).collect().head
    val ks = r.getAs[Double]("ks_stat")
    assert(ks >= 0.0 && ks <= 1.0)
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .filter($"source".isin("src0", "src1"))
      .select($"source", $"n_chars").collect()
    val a = docs.filter(_.getString(0) == "src0").map(_.getLong(1)).sorted
    val b = docs.filter(_.getString(0) == "src1").map(_.getLong(1)).sorted
    assert(a.length == r.getAs[Long]("n1") && b.length == r.getAs[Long]("n2"))
    val support = (a ++ b).distinct.sorted
    val d = support.map { x =>
      val f1 = a.count(_ <= x).toDouble / a.length
      val f2 = b.count(_ <= x).toDouble / b.length
      math.abs(f1 - f2)
    }.max
    assert(math.abs(ks - d) < 1e-6, s"query $ks vs recompute $d")
  }

  test("temperature mixing: weights normalize, flatten toward uniform, allocation fits the budget") {
    val rows = graft.ops.Text.temperatureQ(spark, sfDir).collect()
    assert(rows.length == 20)
    val w = rows.map(_.getAs[Double]("w_sampling"))
    val p = rows.map(_.getAs[Double]("p_natural"))
    assert(math.abs(w.sum - 1.0) < 1e-4)
    assert(rows.map(_.getAs[Long]("alloc_docs")).sum <= 100000L)
    // α < 1 flattens: smallest natural share is upsampled, largest is
    // downsampled
    val smallest = rows.minBy(_.getAs[Double]("p_natural"))
    val largest = rows.maxBy(_.getAs[Double]("p_natural"))
    assert(smallest.getAs[Double]("upsample_factor") > 1.0)
    assert(largest.getAs[Double]("upsample_factor") < 1.0)
    // order preserved: bigger source never gets smaller weight
    val byP = rows.sortBy(_.getAs[Double]("p_natural"))
      .map(_.getAs[Double]("w_sampling"))
    assert(byP.zip(byP.tail).forall { case (a, b) => a <= b })
    assert(p.sum > 0.999 && p.sum < 1.001)
  }

  test("rfm: segments conserve the customer base; scores in range; recency marginals balanced") {
    import spark.implicits._
    val rows = Behavior.rfmQ(spark, sfDir).collect()
    val customers = graft.Tables.t(spark, sfDir, "orders")
      .select($"o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == customers)
    rows.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach(c =>
        assert(r.getAs[Int](c) >= 1 && r.getAs[Int](c) <= 4))
      assert(r.getAs[Double]("avg_monetary") > 0)
    }
    // recency has few ties at this scale → quartile marginals near 25%
    val byR = rows.groupBy(_.getAs[Int]("r_score"))
      .view.mapValues(_.map(_.getAs[Long]("n_customers")).sum).toMap
    (1 to 4).foreach { s =>
      val frac = byR.getOrElse(s, 0L).toDouble / customers
      assert(frac > 0.15 && frac < 0.35, s"r_score $s marginal $frac")
    }
  }

  test("stationary: pi sums to ~1 and is a fixpoint of the transition matrix") {
    import spark.implicits._
    val pi = Patterns.stationaryQ(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pi.size == 5)
    assert(math.abs(pi.values.sum - 1.0) < 1e-6)
    // one more exact step must move nothing by more than the rounding
    // tolerance at 3 iterations on a well-mixed 5-state chain
    val p = Behavior.transitionsQ(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n")))
    val totals = p.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val next = p.groupBy(_._2).map { case (dst, es) =>
      dst -> es.map(e =>
        pi(e._1) * (e._3.toDouble / totals(e._1))).sum
    }
    next.foreach { case (stc, v) =>
      assert(math.abs(v - pi(stc)) < 1e-3, s"$stc: $v vs ${pi(stc)}")
    }
  }

  test("survival: life table conserves users, risk set telescopes, terminal hazard is certain") {
    import spark.implicits._
    val rows = Behavior.survivalQ(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("lifetime_days"))
    assert(rows.nonEmpty)
    val users = graft.Tables.t(spark, sfDir, "events")
      .select($"user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_end")).sum == users)
    assert(rows.head.getAs[Long]("n_risk") == users)
    // n_risk(t_{i+1}) = n_risk(t_i) - n_end(t_i): everyone's uncensored
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_risk") ==
        a.getAs[Long]("n_risk") - a.getAs[Long]("n_end"))
    }
    // at the last observed lifetime everyone still at risk ends there
    assert(rows.last.getAs[Long]("hazard_bp") == 10000L)
    rows.foreach(r => assert(r.getAs[Long]("hazard_bp") <= 10000L))
  }

  test("churn labels: leakage-safe split matches a sequential recompute, both classes present") {
    import spark.implicits._
    val rows = Behavior.churnQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ev = graft.Tables.t(spark, sfDir, "events")
      .select($"user_id", $"ts", $"event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000, r.getString(2)))
    val cut = ev.map(_._2).max - 7L * 86400 * 1000000
    val byUser = ev.groupBy(_._1)
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val es = byUser(u)
      val before = es.filter(_._2 < cut)
      assert(before.nonEmpty)
      assert(r.getAs[Long]("n_events") == before.length.toLong)
      assert(r.getAs[Long]("n_purchases") ==
        before.count(_._3 == "purchase").toLong)
      assert(r.getAs[Long]("recency_hours") ==
        (cut - before.map(_._2).max) / 3600000000L)
      val churned = es.forall(_._2 < cut)
      assert(r.getAs[Int]("churned") == (if (churned) 1 else 0), s"user $u")
    }
    val labels = rows.map(_.getAs[Int]("churned")).toSet
    assert(labels == Set(0, 1) || labels == Set(0),
      "label must be well-formed; at sf0.001+ both classes usually appear")
  }

  test("ushape attribution: per-journey credit fractions sum to 1 and totals match a driver recompute") {
    import spark.implicits._
    val rows = Behavior.ushapeQ(spark, sfDir).collect()
    val ev = graft.Tables.t(spark, sfDir, "events")
      .select($"user_id", $"event_id", $"event_type", $"ts", $"value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3).getTime, r.getDouble(4)))
    val byUser = ev.groupBy(_._1)
    val h1 = 3600000L
    def r9(d: Double) = BigDecimal(d).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val credit = scala.collection.mutable.Map[String, (Long, BigDecimal)]()
    ev.filter(_._3 == "purchase").foreach { case (u, _, _, pts, v) =>
      val touches = byUser(u)
        .filter(t => (t._3 == "view" || t._3 == "click") &&
          t._4 < pts && t._4 >= pts - h1)
        .sortBy(t => (t._4, t._2))
      val k = touches.length
      if (k > 0) {
        val fracs = touches.zipWithIndex.map { case (_, i) =>
          if (k == 1) 1.0
          else if (k == 2) 0.5
          else if (i == 0 || i == k - 1) 0.4
          else 0.2 / (k - 2)
        }
        assert(math.abs(fracs.sum - 1.0) < 1e-9, s"fractions must sum to 1 (k=$k)")
        touches.zip(fracs).foreach { case (t, f) =>
          val (n0, c0) = credit.getOrElse(t._3, (0L, BigDecimal(0)))
          credit(t._3) = (n0 + 1, c0 + r9(v * f))
        }
      }
    }
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ty = r.getAs[String]("touch_type")
      val (n, c) = credit(ty)
      assert(r.getAs[Long]("n_touches") == n, s"$ty touches")
      assert(math.abs(r.getAs[Double]("credited_value") - c.toDouble) < 1e-5,
        s"$ty credit")
    }
  }
}
