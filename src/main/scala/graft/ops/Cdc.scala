package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Change-data-capture compaction over an append-only event log — the
  * ingestion-side primitives a large pipeline runs to turn a mutation
  * stream into queryable state:
  *
  *  - [[latestByKey]]: upsert/merge semantics — collapse the log to the
  *    most recent row per key. Implemented as ONE `max(struct(...))`
  *    aggregation: struct comparison is lexicographic by field order, so
  *    leading with (ts, event_id) picks the latest row with a unique
  *    tiebreak, and the whole payload rides along in the same struct.
  *    Scale shape: map-side combinable — each task keeps ONE struct per
  *    key, so (keys × partitions) structs cross the exchange. The
  *    textbook `row_number() = 1` window ships EVERY log row to its
  *    key's reducer and sorts there; on a 100 TB log with hot keys that
  *    is the difference between a combiner and a straggler.
  *
  *  - [[scd2]]: slowly-changing-dimension type-2 history — collapse
  *    consecutive runs of the same attribute value into validity
  *    intervals [valid_from, valid_to). Change points via `lag` over
  *    (key, ts) — one exchange + sort of the log; interval ends via
  *    `lead` over the (much smaller) change-point frame — a second
  *    exchange proportional to the CHANGE density, not the log. No
  *    self-join, no gaps-and-islands double-numbering pass.
  *
  * Determinism: (ts, event_id) is a total order (event_id unique), so
  * both operators are reproducible across engines and partitionings.
  */
object Cdc {

  /** Latest row per key: `max(struct(orderCols ++ payload))` — the
    * leading order columns must form a unique total order per key. */
  def latestByKey(log: DataFrame, key: Column, order: Seq[Column],
                  payload: Seq[Column]): DataFrame =
    log.groupBy(key)
      .agg(max(struct(order ++ payload: _*)).as("last"))

  def latestQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    latestByKey(t(s, dir, "events"), $"user_id",
      Seq($"ts", $"event_id"), Seq($"event_type", $"value"))
      .select($"user_id", $"last.ts".as("last_ts"),
        $"last.event_id".as("last_event_id"),
        $"last.event_type".as("last_type"),
        $"last.value".as("last_value"))
      .orderBy($"user_id")
  }

  val latestSql: String =
    """SELECT user_id, ts AS last_ts, event_id AS last_event_id,
      |       event_type AS last_type, value AS last_value
      |FROM (SELECT *, row_number() OVER (
      |        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** SCD2 history of `attr` per key: one interval row per run of equal
    * consecutive values; open intervals have `valid_to IS NULL`. */
  def scd2(log: DataFrame, key: Column, ts: Column, tiebreak: Column,
           attr: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tiebreak)
    val changes = log
      .withColumn("graft_prev", lag(attr, 1).over(w))
      .filter(col("graft_prev").isNull || col("graft_prev") =!= attr)
    val w2 = Window.partitionBy(key).orderBy(ts, tiebreak)
    changes
      .withColumn("valid_to", lead(ts, 1).over(w2))
      .select(key, attr.as("attr"), ts.as("valid_from"), col("valid_to"))
  }

  def scd2Q(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val log = t(s, dir, "events").filter($"user_id" < 50)
    scd2(log, $"user_id", $"ts", $"event_id", $"event_type")
      .orderBy($"user_id", $"valid_from", $"attr")
  }

  val scd2Sql: String =
    """WITH c AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         lag(event_type) OVER (
      |           PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events WHERE user_id < 50),
      |ch AS (SELECT * FROM c WHERE prev IS NULL OR prev <> event_type)
      |SELECT user_id, event_type AS attr, ts AS valid_from,
      |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      |FROM ch ORDER BY user_id, valid_from, attr""".stripMargin

  /** Incremental rollup maintenance — the partial-aggregate algebra a
    * pipeline leans on to AVOID re-scanning history: per-day partials
    * (what each ingestion batch writes) re-aggregate into the monthly
    * rollup, and the result is IDENTICAL to aggregating the raw log
    * directly — which is exactly what the DuckDB oracle computes, so
    * the hash compare proves the merge algebra, not just the numbers.
    * Holds because every measure is a semigroup merge: counts and
    * DECIMAL sums add exactly (doubles would drift with the grouping),
    * min/max compose. At 100 TB: the monthly job reads |days × types|
    * partial rows instead of the log. */
  def rollupMergeQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = t(s, dir, "events")
      .groupBy(date_trunc("day", $"ts").as("day"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,6)")).as("sv"),
        min($"value").as("mn"), max($"value").as("mx"))
    daily.groupBy($"event_type")
      .agg(sum($"n").as("n_events"),
        sum($"sv").cast("decimal(18,6)").cast("double").as("total_value"),
        min($"mn").as("v_min"), max($"mx").as("v_max"),
        count(lit(1)).as("n_days"))
      .orderBy($"event_type")
  }

  val rollupMergeSql: String =
    """SELECT event_type,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS total_value,
      |  min(value) AS v_min, max(value) AS v_max,
      |  CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_days
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Snapshot diff — the versioned-table comparison a pipeline runs
    * between two loads of the same source: which keys were added,
    * removed, or changed? The fixture derives v2 from v1 in-query
    * (drop every 13th user's row, modify every 7th's value, add a
    * shifted-key batch) and the diff reconstructs exactly that edit
    * script. Implementation: full outer join on the key comparing
    * 60-bit row digests — change detection costs one hash compare per
    * key, not a column-by-column diff; at 100 TB both sides shuffle
    * (key, digest) pairs only, never payloads. */
  def diffQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val v1 = latestByKey(t(s, dir, "events"), $"user_id",
      Seq($"ts", $"event_id"), Seq($"event_type", $"value"))
      .select($"user_id", $"last.event_type".as("et"), $"last.value".as("v"))
    val v2 = v1.filter($"user_id" % 13 =!= 0)
      .select($"user_id", $"et",
        when($"user_id" % 7 === 0, $"v" + 1.0).otherwise($"v").as("v"))
      .unionByName(v1.filter($"user_id" < 20)
        .select(($"user_id" + 1000000L).as("user_id"), $"et", $"v"))
    def dig(df: DataFrame) = df.select($"user_id",
      Hashing.md5Long60(concat_ws("|", $"et", $"v".cast("string"))).as("h"))
    dig(v1).as("a")
      .join(dig(v2).as("b"), Seq("user_id"), "full_outer")
      .select($"user_id",
        when($"a.h".isNull, "added")
          .when($"b.h".isNull, "removed")
          .when($"a.h" =!= $"b.h", "changed")
          .otherwise("same").as("status"))
      .filter($"status" =!= "same")
      .orderBy($"user_id")
  }

  val diffSql: String =
    """WITH v1 AS (
      |  SELECT user_id, event_type AS et, value AS v
      |  FROM (SELECT *, row_number() OVER (
      |          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |        FROM events) WHERE rn = 1),
      |v2 AS (
      |  SELECT user_id, et,
      |    CASE WHEN user_id % 7 = 0 THEN v + 1.0 ELSE v END AS v
      |  FROM v1 WHERE user_id % 13 <> 0
      |  UNION ALL
      |  SELECT user_id + 1000000, et, v FROM v1 WHERE user_id < 20),
      |d1 AS (SELECT user_id,
      |  ('0x' || substr(md5(et || '|' || CAST(v AS VARCHAR)), 1, 15))::UBIGINT::BIGINT AS h
      |  FROM v1),
      |d2 AS (SELECT user_id,
      |  ('0x' || substr(md5(et || '|' || CAST(v AS VARCHAR)), 1, 15))::UBIGINT::BIGINT AS h
      |  FROM v2)
      |SELECT COALESCE(d1.user_id, d2.user_id) AS user_id,
      |  CASE WHEN d1.h IS NULL THEN 'added'
      |       WHEN d2.h IS NULL THEN 'removed'
      |       WHEN d1.h <> d2.h THEN 'changed'
      |       ELSE 'same' END AS status
      |FROM d1 FULL OUTER JOIN d2 USING (user_id)
      |WHERE (CASE WHEN d1.h IS NULL THEN 'added'
      |            WHEN d2.h IS NULL THEN 'removed'
      |            WHEN d1.h <> d2.h THEN 'changed'
      |            ELSE 'same' END) <> 'same'
      |ORDER BY user_id""".stripMargin

  /** q_cdc_pit entry: POINT-IN-TIME lookup against the SCD2 history —
    * for every purchase, the activity state (the user's latest
    * non-purchase event type) that was valid at the purchase instant,
    * plus how long the user had been in that state (µs). The classic
    * warehouse query an SCD2 dimension exists to answer, composed from
    * [[scd2]] + [[AsOf.joinAsOf]]: a version table's PIT lookup IS an
    * as-of join on `valid_from` (intervals partition each key's
    * timeline, so the latest version starting ≤ ts is the valid one —
    * no BETWEEN range join and its O(n·versions) blow-up).
    *
    * Scale: the dimension is change-density-sized; the as-of union
    * window is ONE key exchange over probes + versions. Output is
    * integers + the state string. */
  def pitQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val log = t(s, dir, "events").filter($"user_id" < 50)
    val dim = scd2(log.filter($"event_type" =!= "purchase"),
        $"user_id", $"ts", $"event_id", $"event_type")
      .select($"user_id", $"valid_from".as("ts"),
        $"attr".as("state"), $"valid_from".as("vf"))
    val probes = log.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id")
    AsOf.joinAsOf(probes, dim, key = "user_id", ts = "ts")
      .filter($"state".isNotNull)
      .select($"event_id", $"user_id", $"state",
        (unix_micros($"ts") - unix_micros($"vf")).as("in_state_us"))
      .orderBy($"event_id")
  }

  val pitSql: String =
    """WITH log AS (SELECT * FROM events WHERE user_id < 50),
      |c AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    lag(event_type) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM log WHERE event_type <> 'purchase'),
      |dim AS (
      |  SELECT user_id, event_type AS state, ts AS vf
      |  FROM c WHERE prev IS NULL OR prev <> event_type),
      |p AS (SELECT user_id, ts, event_id FROM log
      |      WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, state,
      |  epoch_us(p.ts) - epoch_us(vf) AS in_state_us
      |FROM p ASOF JOIN dim ON p.user_id = dim.user_id AND p.ts >= dim.vf
      |ORDER BY p.event_id""".stripMargin

  /** q_cdc_merge entry: MERGE semantics (upsert + delete) applied to a
    * snapshot — the write-side primitive every lakehouse table format
    * exposes as `MERGE INTO`, expressed as the join algebra a plain
    * parquet pipeline runs: a deterministic change batch derived from
    * recent orders (delete where custkey % 10 = 0, update otherwise —
    * new balance = the customer's max recent order value; inserts are
    * the % 7 = 0 changes re-keyed above the snapshot's key space)
    * applied as anti-join (deletes) + left-join-coalesce (updates) +
    * union (inserts), each surviving row tagged with its merge status.
    *
    * Scale shape: one shuffle on the merge key for the left join +
    * anti join (the change batch is typically ≪ snapshot and
    * broadcastable — here it's derived so AQE decides); no window, no
    * second pass. Determinism: the change batch is a combinable
    * groupBy; money goes through DECIMAL(12,2) and is cast ONCE to
    * double at the output boundary (DECIMAL-typed output columns are
    * driver-hash-fragile — see [[Cluster.kmeansQ]]'s contract note);
    * statuses are pure CASE logic. */
  def mergeQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val snap = t(s, dir, "customer")
      .select($"c_custkey".as("key"),
        $"c_acctbal".cast("decimal(12,2)").as("acctbal"),
        $"c_mktsegment".as("segment"))
    val chg = t(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1998-01-01").cast("date"))
      .groupBy($"o_custkey".as("key"))
      .agg(max($"o_totalprice").cast("decimal(12,2)").as("amt"))
    val deletes = chg.filter($"key" % 10 === 0).select($"key")
    val updates = chg.filter($"key" % 10 =!= 0)
      .select($"key", $"amt".as("new_bal"))
    val inserts = chg.filter($"key" % 7 === 0)
      .select(($"key" + 10000000L).as("key"),
        $"amt".cast("double").as("acctbal"),
        lit("NEW").as("segment"), lit("inserted").as("status"))
    snap
      .join(deletes, Seq("key"), "left_anti")
      .join(updates, Seq("key"), "left")
      .select($"key",
        coalesce($"new_bal", $"acctbal").cast("double").as("acctbal"),
        $"segment",
        when($"new_bal".isNotNull, "updated").otherwise("kept").as("status"))
      .unionByName(inserts)
      .orderBy($"key")
  }

  val mergeSql: String =
    """WITH snap AS (
      |  SELECT c_custkey AS key, CAST(c_acctbal AS DECIMAL(12,2)) AS acctbal,
      |    c_mktsegment AS segment
      |  FROM customer),
      |chg AS (
      |  SELECT o_custkey AS key, CAST(MAX(o_totalprice) AS DECIMAL(12,2)) AS amt
      |  FROM orders WHERE o_orderdate >= DATE '1998-01-01'
      |  GROUP BY 1),
      |merged AS (
      |  SELECT s.key,
      |    CAST(COALESCE(u.amt, s.acctbal) AS DOUBLE) AS acctbal, s.segment,
      |    CASE WHEN u.key IS NOT NULL THEN 'updated' ELSE 'kept' END AS status
      |  FROM snap s
      |  LEFT JOIN (SELECT key, amt FROM chg WHERE key % 10 <> 0) u
      |    ON u.key = s.key
      |  WHERE s.key NOT IN (SELECT key FROM chg WHERE key % 10 = 0))
      |SELECT * FROM merged
      |UNION ALL
      |SELECT key + 10000000 AS key, CAST(amt AS DOUBLE) AS acctbal,
      |  'NEW' AS segment, 'inserted' AS status
      |FROM chg WHERE key % 7 = 0
      |ORDER BY key""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cdc_merge" -> mergeQ,
    "q_cdc_latest" -> latestQ,
    "q_cdc_scd2" -> scd2Q,
    "q_cdc_rollup_merge" -> rollupMergeQ,
    "q_cdc_diff" -> diffQ,
    "q_cdc_pit" -> pitQ)

  def oracle: Map[String, String] = Map(
    "q_cdc_merge" -> mergeSql,
    "q_cdc_latest" -> latestSql,
    "q_cdc_scd2" -> scd2Sql,
    "q_cdc_rollup_merge" -> rollupMergeSql,
    "q_cdc_diff" -> diffSql,
    "q_cdc_pit" -> pitSql)
}
