package graft.ops

import graft.SparkSpec
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

/** joinAsOf semantics on hand-built frames: latest-prior matching,
  * inclusive ties, left-outer nulls, key isolation. */
class AsOfSpec extends AnyFunSuite with SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("picks the latest prior right row per key, inclusive at equal ts") {
    import spark.implicits._
    val left = Seq(
      (1L, t("2024-01-01 10:00:00"), "l1"),
      (1L, t("2024-01-01 12:00:00"), "l2"),
      (2L, t("2024-01-01 11:00:00"), "l3"), // other key: no rights at all
      (1L, t("2024-01-01 09:00:00"), "l4")  // before any right row
    ).toDF("k", "ts", "lv")
    val right = Seq(
      (1L, t("2024-01-01 09:30:00"), "r1"),
      (1L, t("2024-01-01 10:00:00"), "r2"), // equal ts → visible to l1
      (1L, t("2024-01-01 11:59:00"), "r3")
    ).toDF("k", "ts", "rv")
    val out = AsOf.joinAsOf(left, right, "k", "ts")
      .select("lv", "rv").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("l1" -> "r2", "l2" -> "r3", "l3" -> null, "l4" -> null))
  }

  test("nullable right payload fields come atomically from the latest row") {
    import spark.implicits._
    val left = Seq((1L, t("2024-01-01 12:00:00"), "l1")).toDF("k", "ts", "lv")
    val right = Seq(
      (1L, t("2024-01-01 10:00:00"), Some(5), Some(9)),
      (1L, t("2024-01-01 11:00:00"), None: Option[Int], Some(7))
    ).toDF("k", "ts", "a", "b")
    val out = AsOf.joinAsOf(left, right, "k", "ts").select("a", "b").head()
    // the LATEST right row has a=null, b=7 — no mixing with the older row
    assert(out.isNullAt(0) && out.getInt(1) == 7)
  }

  test("every left row survives (left-outer), count preserved") {
    import spark.implicits._
    val ev = graft.Tables.t(spark, sfDir, "events")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id".as("p_event"))
    val joined = AsOf.joinAsOf(clicks, purchases, "user_id", "ts")
    assert(joined.count() == clicks.count())
    // and matches never violate the as-of bound
    import org.apache.spark.sql.functions._
    val viol = AsOf.joinAsOf(clicks,
        purchases.withColumn("p_ts", $"ts"), "user_id", "ts")
      .filter($"p_ts".isNotNull && $"p_ts" > $"ts").count()
    assert(viol == 0)
  }

  test("forward: picks the earliest at-or-after right row, verified against a naive recompute") {
    import spark.implicits._
    val ev = graft.Tables.t(spark, sfDir, "events")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
      .groupBy(_._1)
    val got = AsOf.purchasesToNextClick(spark, sfDir).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("c_event")).toMap
    var checked = 0
    purchases.foreach { case (u, pts, pid) =>
      val next = clicks.getOrElse(u, Array.empty)
        .filter(_._2 >= pts)
      if (next.nonEmpty) {
        val best = next.minBy(c => (c._2, c._3))
        // got is LIMIT 500 by event_id — only check covered purchases
        got.get(pid).foreach { ce => assert(ce == best._3, s"purchase $pid")
          checked += 1 }
      } else assert(!got.contains(pid))
    }
    assert(checked > 50, s"only $checked forward matches checked")
  }

  test("nearest: picks the min-|gap| purchase either side, tie to backward") {
    import spark.implicits._
    val ev = graft.Tables.t(spark, sfDir, "events")
    def us(t: Timestamp): Long = t.getTime * 1000 + t.getNanos / 1000 % 1000
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id").collect()
      .map(r => (r.getLong(0), us(r.getTimestamp(1)), r.getLong(2)))
      .groupBy(_._1)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id").collect()
      .map(r => (r.getLong(0), us(r.getTimestamp(1)), r.getLong(2)))
    val got = AsOf.clicksToNearestPurchase(spark, sfDir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[String]("direction"), r.getAs[Long]("p_event"),
          r.getAs[Long]("gap_us"))).toMap
    var checked = 0
    clicks.foreach { case (u, cts, cid) =>
      val ps = purchases.getOrElse(u, Array.empty)
      if (ps.isEmpty) assert(!got.contains(cid))
      else got.get(cid).foreach { case (dir, pe, gap) =>
        // nearest by |gap|; tie prefers backward; within a side,
        // the as-of joins pick latest-prior / earliest-after, which on
        // distinct event times is unique per side
        val bwd = ps.filter(_._2 <= cts)
          .sortBy(p => (-p._2, p._3)).headOption
        val fwd = ps.filter(_._2 >= cts)
          .sortBy(p => (p._2, p._3)).headOption
        val bGap = bwd.map(p => cts - p._2)
        val fGap = fwd.map(p => p._2 - cts)
        val wantBackward = bGap.isDefined &&
          (fGap.isEmpty || bGap.get <= fGap.get)
        assert(dir == (if (wantBackward) "backward" else "forward"),
          s"click $cid direction")
        val want = if (wantBackward) bwd.get else fwd.get
        assert(pe == want._3 &&
          gap == (if (wantBackward) bGap.get else fGap.get),
          s"click $cid pick")
        checked += 1
      }
    }
    assert(checked > 50, s"only $checked nearest matches checked")
  }
}
