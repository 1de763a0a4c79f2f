package graft.ops

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cdc semantics on hand-built logs: latest-row selection with tiebreak,
  * equivalence to the rank-window formulation, SCD2 run-collapsing and
  * interval contiguity. */
class CdcSpec extends AnyFunSuite with SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("latestByKey picks the max-(ts, tiebreak) row, payload intact") {
    import spark.implicits._
    val log = Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, "a", 1.0),
      (1L, t("2024-01-01 12:00:00"), 2L, "b", 2.0),
      (1L, t("2024-01-01 12:00:00"), 3L, "c", 3.0), // ts tie → event_id wins
      (2L, t("2024-01-01 09:00:00"), 4L, "d", 4.0)
    ).toDF("k", "ts", "eid", "tp", "v")
    val out = Cdc.latestByKey(log, $"k", Seq($"ts", $"eid"), Seq($"tp", $"v"))
      .select($"k", $"last.tp", $"last.v")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(out == Map(1L -> ("c", 3.0), 2L -> ("d", 4.0)))
  }

  test("latestByKey ≡ row_number()=1 window on real events") {
    import spark.implicits._
    val log = graft.Tables.t(spark, sfDir, "events")
    val agg = Cdc.latestByKey(log, $"user_id", Seq($"ts", $"event_id"),
        Seq($"event_type", $"value"))
      .select($"user_id", $"last.event_id".as("event_id"))
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val win = log.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"user_id", $"event_id")
    assert(agg.except(win).isEmpty && win.except(agg).isEmpty)
  }

  test("scd2 collapses runs, intervals are contiguous, one open per key") {
    import spark.implicits._
    val log = Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, "a"),
      (1L, t("2024-01-01 11:00:00"), 2L, "a"), // same run
      (1L, t("2024-01-01 12:00:00"), 3L, "b"), // change
      (1L, t("2024-01-01 13:00:00"), 4L, "a"), // change back → new interval
      (2L, t("2024-01-01 10:30:00"), 5L, "x")
    ).toDF("k", "ts", "eid", "attr")
    val out = Cdc.scd2(log, $"k", $"ts", $"eid", $"attr")
      .orderBy($"k", $"valid_from")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3))))
    assert(out.toSeq == Seq(
      (1L, "a", t("2024-01-01 10:00:00"), Some(t("2024-01-01 12:00:00"))),
      (1L, "b", t("2024-01-01 12:00:00"), Some(t("2024-01-01 13:00:00"))),
      (1L, "a", t("2024-01-01 13:00:00"), None),
      (2L, "x", t("2024-01-01 10:30:00"), None)))
    // contiguity + single open interval hold on the real log too
    val hist = Cdc.scd2(graft.Tables.t(spark, sfDir, "events"),
      $"user_id", $"ts", $"event_id", $"event_type")
    val wk = Window.partitionBy($"user_id").orderBy($"valid_from")
    val gaps = hist.withColumn("nxt", lead($"valid_from", 1).over(wk))
      .filter($"nxt".isNotNull && $"valid_to" =!= $"nxt")
    assert(gaps.isEmpty, "valid_to must equal the next interval's valid_from")
    val opens = hist.filter($"valid_to".isNull)
      .groupBy($"user_id").count().filter($"count" =!= 1)
    assert(opens.isEmpty, "exactly one open interval per key")
  }

  test("pit lookup: every purchase lands inside its version's validity interval") {
    import spark.implicits._
    val log = graft.Tables.t(spark, sfDir, "events").filter($"user_id" < 50)
    val dim = Cdc.scd2(log.filter($"event_type" =!= "purchase"),
        $"user_id", $"ts", $"event_id", $"event_type")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).getTime,
        Option(r.getTimestamp(3)).map(_.getTime)))
    val got = Cdc.pitQ(spark, sfDir).collect()
    assert(got.nonEmpty)
    val purchases = log.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getTimestamp(2).getTime))
      .toMap
    got.foreach { r =>
      val (u, pts) = purchases(r.getAs[Long]("event_id"))
      assert(u == r.getAs[Long]("user_id"))
      val st = r.getAs[String]("state")
      // the reported version must contain the purchase instant
      val hit = dim.filter(d => d._1 == u && d._2 == st &&
        d._3 <= pts && d._4.forall(pts < _))
      assert(hit.nonEmpty, s"purchase at $pts not inside a '$st' interval")
      assert(st != "purchase")
      assert(r.getAs[Long]("in_state_us") >= 0)
    }
  }

  test("merge: statuses partition correctly and every row matches a driver-applied change batch") {
    import spark.implicits._
    val rows = Cdc.mergeQ(spark, sfDir).collect()
    val snap = graft.Tables.t(spark, sfDir, "customer")
      .select($"c_custkey", $"c_acctbal", $"c_mktsegment").collect()
      .map(r => (r.getLong(0), (BigDecimal(r.getDouble(1))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP), r.getString(2)))).toMap
    val chg = graft.Tables.t(spark, sfDir, "orders")
      .filter($"o_orderdate" >= lit("1998-01-01").cast("date"))
      .groupBy($"o_custkey").agg(max($"o_totalprice").as("amt")).collect()
      .map(r => (r.getLong(0), BigDecimal(r.getDouble(1))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP))).toMap
    val expected = scala.collection.mutable.Map[Long, (BigDecimal, String, String)]()
    snap.foreach { case (k, (bal, seg)) =>
      if (!(chg.contains(k) && k % 10 == 0)) {
        if (chg.contains(k) && k % 10 != 0) expected(k) = (chg(k), seg, "updated")
        else expected(k) = (bal, seg, "kept")
      }
    }
    chg.foreach { case (k, amt) =>
      if (k % 7 == 0) expected(k + 10000000L) = (amt, "NEW", "inserted")
    }
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val k = r.getAs[Long]("key")
      val (bal, seg, st) = expected(k)
      assert(BigDecimal(r.getAs[Double]("acctbal"))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP) == bal, s"key $k bal")
      assert(r.getAs[String]("segment") == seg, s"key $k seg")
      assert(r.getAs[String]("status") == st, s"key $k status")
    }
    // deleted keys are genuinely absent
    val out = rows.map(_.getAs[Long]("key")).toSet
    chg.keys.filter(k => k % 10 == 0 && snap.contains(k))
      .foreach(k => assert(!out.contains(k), s"key $k should be deleted"))
  }

  test("negation: abandoned chains match a driver NOT-EXISTS recompute") {
    import spark.implicits._
    val rows = graft.ops.Patterns.negationQ(spark, sfDir).collect()
    val ev = graft.Tables.t(spark, sfDir, "events")
      .select($"user_id", $"event_type", $"ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime))
    val byUser = ev.groupBy(_._1)
    val m30 = 30L * 60000
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val evs = byUser(u)
      val views = evs.filter(_._2 == "view").map(_._3)
      val clicks = evs.filter(_._2 == "click").map(_._3)
      val purchases = evs.filter(_._2 == "purchase").map(_._3)
      val chains = for {
        v <- views; c <- clicks if c > v && c <= v + m30
      } yield c
      val abandoned = chains.filterNot(c =>
        purchases.exists(p => p > c && p <= c + m30))
      assert(r.getAs[Long]("n_chains") == chains.length, s"user $u chains")
      assert(r.getAs[Long]("n_abandoned") == abandoned.length, s"user $u abandoned")
      assert(math.abs(r.getAs[Double]("abandon_rate") -
        abandoned.length.toDouble / chains.length) < 1e-5)
    }
  }
}
