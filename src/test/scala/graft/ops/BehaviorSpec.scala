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
      val p = rs.map(_.getAs[java.math.BigDecimal]("p").doubleValue).sum
      assert(math.abs(p - 1.0) < 0.01, s"src $src probs sum to $p")
    }
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
      assert(r.getAs[java.math.BigDecimal]("avg_monetary")
        .doubleValue > 0)
    }
    // recency has few ties at this scale → quartile marginals near 25%
    val byR = rows.groupBy(_.getAs[Int]("r_score"))
      .view.mapValues(_.map(_.getAs[Long]("n_customers")).sum).toMap
    (1 to 4).foreach { s =>
      val frac = byR.getOrElse(s, 0L).toDouble / customers
      assert(frac > 0.15 && frac < 0.35, s"r_score $s marginal $frac")
    }
  }
}
