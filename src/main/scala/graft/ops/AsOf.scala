package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** AS-OF join — the canonical "operator Spark lacks" (no ASOF in Spark
  * SQL; DataFusion 43 lacks it too, SURVEY §2b). For each left row, pick
  * the LATEST right row with `right.ts <= left.ts` within the same key.
  *
  * Composition, not a custom physical operator, because built-ins can
  * express the distributed shape exactly: union both sides with a side
  * tag, then one `last(value, ignoreNulls)` window per right payload
  * column over (key, ORDER BY ts, side). That is a SINGLE hash exchange
  * on the key + one sort — the same cost as any sort-merge join — with
  * no per-row subquery and no range blow-up; it survives 100× data as
  * long as single keys fit a task's sort spill, which is the same bound
  * every windowed op has. Right rows sort BEFORE left rows at equal ts
  * (side 0 < 1), giving the inclusive `left.ts >= right.ts` semantics of
  * DuckDB's ASOF JOIN.
  */
object AsOf {

  /** Left-outer as-of join. Right payload columns (everything except
    * `key`/`ts`) appear in the output, null where no prior right row
    * exists; filter on one of them for inner semantics. Column names
    * must be disjoint apart from `key`/`ts`.
    *
    * The right payload travels as ONE struct and a single
    * `last(struct, ignoreNulls)` fills it — per-column fills would mix
    * columns from different right rows whenever the latest right row has
    * a null payload field (a right ROW is never null even when its
    * fields are, so the struct fill is atomic). */
  def joinAsOf(left: DataFrame, right: DataFrame,
               key: String, ts: String): DataFrame = {
    val lPay = left.columns.filterNot(c => c == key || c == ts)
    val rPay = right.columns.filterNot(c => c == key || c == ts)
    val rStructType = org.apache.spark.sql.types.StructType(
      rPay.map(c => right.schema(right.schema.fieldIndex(c))))
    def nulls(src: DataFrame, cols: Seq[String]): Seq[Column] =
      cols.map(c => lit(null).cast(src.schema(c).dataType).as(c))
    val lTagged = left.select(
      Seq(col(key), col(ts), lit(1).as("__side")) ++
        lPay.map(col) :+ lit(null).cast(rStructType).as("__r"): _*)
    val rTagged = right.select(
      Seq(col(key), col(ts), lit(0).as("__side")) ++
        nulls(left, lPay.toSeq) :+ struct(rPay.map(col): _*).as("__r"): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(Seq(col(key), col(ts)) ++ lPay.map(col) ++
        rPay.map(c => col(s"__r.$c").as(c)): _*)
  }

  /** Each click joined to the user's latest prior (or simultaneous)
    * purchase; inner semantics via the non-null filter. */
  def clicksToPurchases(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts",
        $"event_id".as("p_event"), $"value".as("p_value"),
        $"ts".as("p_ts")) // purchase time carried as payload for the gap
    joinAsOf(clicks, purchases, key = "user_id", ts = "ts")
      .filter($"p_event".isNotNull)
      .select($"event_id", $"user_id", $"p_event", $"p_value",
        (unix_micros($"ts") - unix_micros($"p_ts")).as("gap_us"))
      .orderBy($"event_id")
      .limit(500)
  }

  val clicksToPurchasesSql: String =
    """WITH c AS (
      |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
      |p AS (
      |  SELECT user_id, ts AS pts, event_id AS p_event, value AS p_value
      |  FROM events WHERE event_type = 'purchase')
      |SELECT c.event_id, c.user_id, p_event, p_value,
      |  epoch_us(c.ts) - epoch_us(pts) AS gap_us
      |FROM c ASOF JOIN p ON c.user_id = p.user_id AND c.ts >= pts
      |ORDER BY c.event_id LIMIT 500""".stripMargin

  /** FORWARD as-of join — for each left row, the EARLIEST right row with
    * `right.ts >= left.ts` in the same key (pandas `merge_asof
    * direction='forward'`). The mirror of [[joinAsOf]]: identical
    * single-exchange union-window shape, with the sort reversed and
    * left rows ordered BEFORE right rows at equal ts (side 0 < 1 in
    * descending-side order) so equality matches inclusively. */
  def joinAsOfForward(left: DataFrame, right: DataFrame,
                      key: String, ts: String): DataFrame = {
    val lPay = left.columns.filterNot(c => c == key || c == ts)
    val rPay = right.columns.filterNot(c => c == key || c == ts)
    val rStructType = org.apache.spark.sql.types.StructType(
      rPay.map(c => right.schema(right.schema.fieldIndex(c))))
    def nulls(src: DataFrame, cols: Seq[String]): Seq[Column] =
      cols.map(c => lit(null).cast(src.schema(c).dataType).as(c))
    val lTagged = left.select(
      Seq(col(key), col(ts), lit(1).as("__side")) ++
        lPay.map(col) :+ lit(null).cast(rStructType).as("__r"): _*)
    val rTagged = right.select(
      Seq(col(key), col(ts), lit(0).as("__side")) ++
        nulls(left, lPay.toSeq) :+ struct(rPay.map(col): _*).as("__r"): _*)
    // descending ts: "earliest right at or after left.ts" becomes the
    // last right seen walking down from the future; right rows (side 0)
    // at equal ts sort BEFORE the left row, keeping >= inclusive
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).desc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(Seq(col(key), col(ts)) ++ lPay.map(col) ++
        rPay.map(c => col(s"__r.$c").as(c)): _*)
  }

  /** q_join_asof_fwd entry: each purchase joined to the user's NEXT
    * click at or after it — the "what did the buyer do next"
    * direction; time-to-next-action in µs rides along. */
  def purchasesToNextClick(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts",
        $"event_id".as("c_event"), $"ts".as("c_ts"))
    joinAsOfForward(purchases, clicks, key = "user_id", ts = "ts")
      .filter($"c_event".isNotNull)
      .select($"event_id", $"user_id", $"c_event",
        (unix_micros($"c_ts") - unix_micros($"ts")).as("wait_us"))
      .orderBy($"event_id")
      .limit(500)
  }

  /** Oracle: DuckDB ASOF JOIN only matches backward (`>=`), so the
    * forward direction is expressed by ASOF-joining NEGATED timestamps
    * — order-reversal is exactly what [[joinAsOfForward]] does too. */
  val purchasesToNextClickSql: String =
    """WITH p AS (
      |  SELECT user_id, ts, event_id, -epoch_us(ts) AS nts
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT user_id, -epoch_us(ts) AS nts, event_id AS c_event,
      |    epoch_us(ts) AS c_us
      |  FROM events WHERE event_type = 'click')
      |SELECT p.event_id, p.user_id, c_event,
      |  c_us - epoch_us(p.ts) AS wait_us
      |FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.nts >= c.nts
      |ORDER BY p.event_id LIMIT 500""".stripMargin

  /** q_join_asof_near entry: the THIRD as-of direction — each click
    * joined to the user's NEAREST purchase in time, either side, tie →
    * the earlier one (pandas `merge_asof direction='nearest'`
    * semantics). Completes the backward/forward/nearest triple, the
    * full mode set of every as-of API. Composition: one backward and
    * one forward pass ([[joinAsOf]] / [[joinAsOfForward]] — each a
    * single key exchange + sort), then a per-click pick of the smaller
    * absolute gap. At 100 TB this is two windowed passes over the same
    * key partitioning — AQE reuses the exchange — plus a click-keyed
    * equi-join of two already-collapsed frames. Integer-µs gaps; the
    * direction label makes the tie rule auditable in the output. */
  def clicksToNearestPurchase(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id")
    val pb = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id".as("b_event"),
        $"value".as("b_value"), $"ts".as("b_ts"))
    val pf = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id".as("f_event"),
        $"value".as("f_value"), $"ts".as("f_ts"))
    val bwd = joinAsOf(clicks, pb, key = "user_id", ts = "ts")
      .select($"event_id", $"user_id", $"ts", $"b_event", $"b_value",
        (unix_micros($"ts") - unix_micros($"b_ts")).as("b_gap"))
    val fwd = joinAsOfForward(clicks, pf, key = "user_id", ts = "ts")
      .select($"event_id", $"f_event", $"f_value",
        (unix_micros($"f_ts") - unix_micros($"ts")).as("f_gap"))
    bwd.join(fwd, "event_id")
      .filter($"b_event".isNotNull || $"f_event".isNotNull)
      .select($"event_id", $"user_id",
        when($"b_event".isNotNull &&
            ($"f_event".isNull || $"b_gap" <= $"f_gap"), "backward")
          .otherwise("forward").as("direction"),
        when($"b_event".isNotNull &&
            ($"f_event".isNull || $"b_gap" <= $"f_gap"), $"b_event")
          .otherwise($"f_event").as("p_event"),
        when($"b_event".isNotNull &&
            ($"f_event".isNull || $"b_gap" <= $"f_gap"), $"b_value")
          .otherwise($"f_value").as("p_value"),
        when($"b_event".isNotNull &&
            ($"f_event".isNull || $"b_gap" <= $"f_gap"), $"b_gap")
          .otherwise($"f_gap").as("gap_us"))
      .orderBy($"event_id")
      .limit(500)
  }

  /** Oracle: two DuckDB ASOF joins (the forward one on negated
    * timestamps, as in [[purchasesToNextClickSql]]) combined with the
    * identical tie-to-backward CASE. */
  val clicksToNearestPurchaseSql: String =
    """WITH c AS (
      |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
      |p AS (
      |  SELECT user_id, ts AS pts, event_id AS p_event, value AS p_value
      |  FROM events WHERE event_type = 'purchase'),
      |b AS (
      |  SELECT c.event_id, c.user_id, c.ts, p_event AS b_event,
      |    p_value AS b_value, epoch_us(c.ts) - epoch_us(pts) AS b_gap
      |  FROM c ASOF LEFT JOIN p
      |    ON c.user_id = p.user_id AND c.ts >= pts),
      |cf AS (SELECT user_id, ts, event_id, -epoch_us(ts) AS nts FROM c),
      |pf AS (SELECT user_id, -epoch_us(pts) AS nts, p_event AS f_event,
      |         p_value AS f_value, epoch_us(pts) AS p_us FROM p),
      |f AS (
      |  SELECT cf.event_id, f_event, f_value,
      |    p_us - epoch_us(cf.ts) AS f_gap
      |  FROM cf ASOF LEFT JOIN pf
      |    ON cf.user_id = pf.user_id AND cf.nts >= pf.nts)
      |SELECT b.event_id, b.user_id,
      |  CASE WHEN b_event IS NOT NULL
      |    AND (f_event IS NULL OR b_gap <= f_gap)
      |    THEN 'backward' ELSE 'forward' END AS direction,
      |  CASE WHEN b_event IS NOT NULL
      |    AND (f_event IS NULL OR b_gap <= f_gap)
      |    THEN b_event ELSE f_event END AS p_event,
      |  CASE WHEN b_event IS NOT NULL
      |    AND (f_event IS NULL OR b_gap <= f_gap)
      |    THEN b_value ELSE f_value END AS p_value,
      |  CASE WHEN b_event IS NOT NULL
      |    AND (f_event IS NULL OR b_gap <= f_gap)
      |    THEN b_gap ELSE f_gap END AS gap_us
      |FROM b JOIN f ON f.event_id = b.event_id
      |WHERE b_event IS NOT NULL OR f_event IS NOT NULL
      |ORDER BY b.event_id LIMIT 500""".stripMargin

  // --- registry -------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_asof" -> clicksToPurchases,
    "q_join_asof_fwd" -> purchasesToNextClick,
    "q_join_asof_near" -> clicksToNearestPurchase)

  def oracle: Map[String, String] = Map(
    "q_join_asof" -> clicksToPurchasesSql,
    "q_join_asof_fwd" -> purchasesToNextClickSql,
    "q_join_asof_near" -> clicksToNearestPurchaseSql)
}
