package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Tier D relational operators (SURVEY.md §2b): the query surface the
  * reference reaches by delegating config SQL to DataFusion
  * (`/root/reference/src/main.rs:42-44`). Here each category is expressed
  * with the Spark DataFrame API so Catalyst plans it natively (predicate
  * pushdown, column pruning, partial aggregation, join-strategy selection,
  * AQE at runtime).
  *
  * Determinism-for-the-oracle conventions (driver hash-compares vs DuckDB):
  *  - every query ends in a total ORDER BY (stable across engines);
  *  - sums over cent-valued doubles go through DECIMAL so the result is
  *    exact and independent of partition/accumulation order, then cast
  *    back to double (same shape in the oracle SQL);
  *  - sums over integral-valued doubles (e.g. l_quantity) stay double —
  *    exact for any order at these magnitudes;
  *  - derived statistics (stddev/variance/corr) are computed from exact
  *    decimal power sums with an identical final double expression on both
  *    sides, so the IEEE-754 result is bit-identical regardless of each
  *    engine's internal accumulation order.
  */
object Relational {

  /** sum(cents-valued double) exactly: via decimal, back to double. */
  private def dsum(c: Column) =
    sum(c.cast("decimal(18,2)")).cast("double")

  // --- Aggregation ---------------------------------------------------------

  /** TPC-H Q1-style pricing summary: filter → hash agg (partial+final,
    * map-side combine is automatic) → sort. Scales: agg keys have tiny
    * cardinality, so the shuffle moves only |groups|×|partitions| rows. */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        sum(($"l_extendedprice".cast("decimal(18,2)") *
          (lit(1).cast("decimal(9,2)") - $"l_discount".cast("decimal(9,2)"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1PricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  SUM(l_quantity) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(9,2)) - CAST(l_discount AS DECIMAL(9,2)))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q_agg_argmax entry: the ARGMAX scalar-aggregate surface —
    * `max_by`/`min_by` (which order's key carries the extreme price),
    * `count_if`, and `bool_and`/`bool_or` — the Tier-D aggregates that
    * answer "WHICH row holds the extreme", not just the extreme value.
    * Determinism: max_by is tie-UNDEFINED in both engines, so the
    * ordering key is price-cents zero-padded with the orderkey
    * appended — lexicographic = (price, key), strictly unique — making
    * the selected row well-defined under any partitioning.
    *
    * Scale shape: one map-side-combinable aggregate; the argmax state
    * is one (key, value) pair per group per partition. */
  def aggArgmax(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ordKey = concat(
      lpad(round($"o_totalprice" * 100).cast("long").cast("string"), 12, "0"),
      lpad($"o_orderkey".cast("string"), 12, "0"))
    t(s, dir, "orders")
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        max_by($"o_orderkey", ordKey).as("priciest_order"),
        min_by($"o_orderkey", ordKey).as("cheapest_order"),
        max(round($"o_totalprice" * 100).cast("long")).as("max_price_cents"),
        expr("count_if(o_totalprice > 100000)").as("n_big"),
        expr("bool_and(o_totalprice > 0)").cast("int").as("all_positive"),
        expr("bool_or(o_orderstatus = 'F')").cast("int").as("any_finished"))
      .orderBy($"o_orderpriority")
  }

  val aggArgmaxSql: String =
    """WITH o AS (
      |  SELECT *,
      |    lpad(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR), 12, '0')
      |      || lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS ok
      |  FROM orders)
      |SELECT o_orderpriority,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  max_by(o_orderkey, ok) AS priciest_order,
      |  min_by(o_orderkey, ok) AS cheapest_order,
      |  CAST(MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS max_price_cents,
      |  CAST(count_if(o_totalprice > 100000) AS BIGINT) AS n_big,
      |  CAST(bool_and(o_totalprice > 0) AS INT) AS all_positive,
      |  CAST(bool_or(o_orderstatus = 'F') AS INT) AS any_finished
      |FROM o GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** COUNT/SUM DISTINCT + plain agg in one pass: Spark plans expand +
    * two-phase agg; distinct keys shuffle once on (group, value). */
  def aggDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .groupBy($"o_orderpriority")
      .agg(
        countDistinct($"o_custkey").as("n_customers"),
        count(lit(1)).as("n_orders"),
        min($"o_orderdate").as("first_order"),
        max($"o_orderdate").as("last_order"))
      .orderBy($"o_orderpriority")
  }

  val aggDistinctSql: String =
    """SELECT o_orderpriority,
      |  COUNT(DISTINCT o_custkey) AS n_customers,
      |  COUNT(*) AS n_orders,
      |  MIN(o_orderdate) AS first_order,
      |  MAX(o_orderdate) AS last_order
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Derived statistics from exact decimal power sums: stddev/variance via
    * sum(x), sum(x^2), n — the final double expression is identical on both
    * engines, so results are bit-exact and independent of partition order
    * (a plain stddev_samp would differ in the last ulps per accumulation
    * order). Demonstrates multi-aggregate partial/final hash agg. */
  def aggStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val x = $"c_acctbal".cast("decimal(18,2)")
    t(s, dir, "customer")
      .groupBy($"c_mktsegment")
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("s1"),
        sum(x * x).cast("double").as("s2"))
      .select($"c_mktsegment", $"n",
        ($"s1" / $"n").as("mean_bal"),
        sqrt(($"s2" - $"s1" * $"s1" / $"n") / ($"n" - 1)).as("stddev_bal"),
        (($"s2" - $"s1" * $"s1" / $"n") / ($"n" - 1)).as("var_bal"))
      .orderBy($"c_mktsegment")
  }

  val aggStatsSql: String =
    """WITH s AS (
      |  SELECT c_mktsegment, COUNT(*) AS n,
      |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS s1,
      |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)) * CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS s2
      |  FROM customer GROUP BY c_mktsegment)
      |SELECT c_mktsegment, n, s1 / n AS mean_bal,
      |  sqrt((s2 - s1 * s1 / n) / (n - 1)) AS stddev_bal,
      |  (s2 - s1 * s1 / n) / (n - 1) AS var_bal
      |FROM s ORDER BY c_mktsegment""".stripMargin

  /** Approximate profiling — the 100 TB form of distinct counting:
    * `approx_count_distinct` (HyperLogLog++) keeps a fixed-size register
    * sketch per group, merged commutatively map-side, where the exact
    * count must shuffle every distinct value. The sketch is
    * deterministic for given data (register maxes over per-value
    * hashes, independent of partition order), so the driver row uses
    * the ANN-style gate pattern: emit whether the estimate lands within
    * 5% of the exact count (rsd configured at 2%), which the oracle
    * asserts for every group. The exact count rides along only to
    * compute the gate — at real scale you'd run the sketch alone. */
  def approxDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey", rsd = 0.02).as("apx"),
        countDistinct($"l_partkey").as("nd"))
      .select($"l_returnflag",
        (abs($"apx" - $"nd") <= $"nd" * 0.05).cast("int").as("within_5pct"))
      .orderBy($"l_returnflag")
  }

  val approxDistinctSql: String =
    """SELECT l_returnflag, 1 AS within_5pct
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Approximate quantile profiling: `percentile_approx` (Greenwald-
    * Khanna sketch — fixed-size state, merged map-side) gated at 1%
    * relative error per quantile against the exact value. At 100 TB only
    * the sketch is viable — the exact side rides along solely to compute
    * the gate (same pattern as [[approxDistinct]]: sketch output isn't
    * cross-engine hash-stable, the gate booleans are). The exact side
    * deliberately avoids the `percentile` aggregate (boxed value→count
    * maps merged single-threaded per group — measured 4.3s of
    * [[aggStats2]]'s 5.0s at sf0.1 before it was rewritten) and reuses
    * its codegen R-7 shape instead: one per-group sort window +
    * interpolation-weight conditional sums. */
  def approxQuantiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
    val ps = array(lit(0.5), lit(0.9), lit(0.99))
    val apx = li.groupBy($"l_returnflag")
      .agg(percentile_approx($"l_extendedprice", ps, lit(10000)).as("apx"))
    val wOrd = Window.partitionBy($"l_returnflag").orderBy($"v")
    val wAll = Window.partitionBy($"l_returnflag")
    def interp(p: Double): Column = {
      val idx = lit(p) * ($"cnt" - lit(1)).cast("double") // 0-based R-7 index
      val d = abs(idx - ($"rn" - lit(1)).cast("double"))
      sum(when(d < 1, $"v" * (lit(1d) - d)).otherwise(lit(0d)))
    }
    val exact = li.select($"l_returnflag", $"l_extendedprice".as("v"))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("cnt", count(lit(1)).over(wAll))
      .groupBy($"l_returnflag")
      .agg(interp(0.5).as("e50"), interp(0.9).as("e90"), interp(0.99).as("e99"))
    apx.join(exact, "l_returnflag")
      .select($"l_returnflag" +: Seq(("e50", 0, "p50_ok"), ("e90", 1, "p90_ok"),
        ("e99", 2, "p99_ok")).map { case (e, i, o) =>
          (abs($"apx" (i) - col(e)) <= col(e) * 0.01).cast("int").as(o)
        }: _*)
      .orderBy($"l_returnflag")
  }

  val approxQuantilesSql: String =
    """SELECT l_returnflag, 1 AS p50_ok, 1 AS p90_ok, 1 AS p99_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** HAVING: post-aggregation filter — Catalyst plans it as Filter above
    * Aggregate; only qualifying groups survive the final stage. */
  def aggHaving(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("spend"))
      .filter($"n_orders" >= 5)
      .orderBy($"spend".desc, $"o_custkey")
      .limit(50)
  }

  val aggHavingSql: String =
    """SELECT o_custkey, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 5
      |ORDER BY spend DESC, o_custkey LIMIT 50""".stripMargin

  /** ROLLUP: hierarchical subtotals (nation → region → grand total) in one
    * pass via Expand; at scale this is one shuffle, not three queries. */
  def rollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .rollup($"n_regionkey", $"n_name")
      .agg(count(lit(1)).as("n_cust"), dsum($"c_acctbal").as("total_bal"))
      .orderBy($"n_regionkey".asc_nulls_last, $"n_name".asc_nulls_last)
  }

  val rollupSql: String =
    """SELECT n_regionkey, n_name, COUNT(*) AS n_cust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY ROLLUP (n_regionkey, n_name)
      |ORDER BY n_regionkey ASC NULLS LAST, n_name ASC NULLS LAST""".stripMargin

  /** CUBE over two independent dims + GROUPING() to label subtotal rows. */
  def cube(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        grouping($"o_orderstatus").cast("long").as("g_status"),
        grouping($"o_orderpriority").cast("long").as("g_prio"))
      .orderBy($"o_orderstatus".asc_nulls_last, $"o_orderpriority".asc_nulls_last)
  }

  val cubeSql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  GROUPING(o_orderstatus) AS g_status, GROUPING(o_orderpriority) AS g_prio
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS LAST, o_orderpriority ASC NULLS LAST""".stripMargin

  /** Correlation + exact percentiles per group. corr comes from exact
    * decimal power sums (same technique as [[aggStats]] — a plain
    * `corr()` would drift in the last ulps with partition order);
    * percentiles use the shared R-7 definition (index = p·(n−1),
    * linear interpolation) in both engines, rounded to absorb the
    * one-ulp formula difference between `lo + d·(hi−lo)` styles. */
  def aggStats2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val x = $"l_quantity".cast("decimal(18,2)")
    val y = $"l_extendedprice".cast("decimal(18,2)")
    val li = t(s, dir, "lineitem")
    // Two separate aggregations, joined on the tiny group key: a single
    // Percentile in an agg list forces the WHOLE aggregate into
    // non-codegen ObjectHashAggregate (measured ~10× on the decimal
    // sums); split, the sums stay in whole-stage codegen and only the
    // (flag, price) pair feeds the object agg.
    val sums = li.groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("sx"),
        sum(y).cast("double").as("sy"),
        sum(x * y).cast("double").as("sxy"),
        sum(x * x).cast("double").as("sxx"),
        sum(y * y).cast("double").as("syy"))
    // Exact R-7 percentiles WITHOUT the `percentile` aggregate: that
    // ObjectHashAggregate builds a boxed value→count map per partition
    // and merges them single-threaded per group (measured 4.3s of this
    // query's 5.0s at sf0.1). Instead sort each group once (window
    // row_number — codegen, one exchange reused by the count) and let
    // only the floor/ceil-index rows contribute via interpolation
    // weights: percentile collapses to a codegen'd conditional sum.
    // Exact percentiles inherently order each group; with low-cardinality
    // groups like these the per-group sort is the scalable form (the
    // object-agg merge funnels the same data through one thread but with
    // boxing), and high-cardinality/huge groups would switch to
    // approx_percentile.
    val wOrd = Window.partitionBy($"l_returnflag").orderBy($"v")
    val wAll = Window.partitionBy($"l_returnflag")
    def interp(p: Double): Column = {
      val idx = lit(p) * ($"cnt" - lit(1)).cast("double") // 0-based R-7 index
      val d = abs(idx - ($"rn" - lit(1)).cast("double"))
      sum(when(d < 1, $"v" * (lit(1d) - d)).otherwise(lit(0d)))
    }
    val pcts = li.select($"l_returnflag", $"l_extendedprice".as("v"))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("cnt", count(lit(1)).over(wAll))
      .groupBy($"l_returnflag")
      .agg(interp(0.5).as("p50"), interp(0.9).as("p90"))
    sums.join(pcts, "l_returnflag")
      .select($"l_returnflag", $"n",
        round(($"n" * $"sxy" - $"sx" * $"sy") /
          (sqrt($"n" * $"sxx" - $"sx" * $"sx") *
            sqrt($"n" * $"syy" - $"sy" * $"sy")), 6).as("corr_qty_price"),
        round($"p50", 4).as("p50"),
        round($"p90", 4).as("p90"))
      .orderBy($"l_returnflag")
  }

  val aggStats2Sql: String =
    """WITH s AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
      |    quantile_cont(l_extendedprice, 0.5) AS p50,
      |    quantile_cont(l_extendedprice, 0.9) AS p90
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  ROUND((n * sxy - sx * sy) /
      |    (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_qty_price,
      |  ROUND(p50, 4) AS p50,
      |  ROUND(p90, 4) AS p90
      |FROM s ORDER BY l_returnflag""".stripMargin

  /** Explicit GROUPING SETS (SQL path — parsed by Spark's own parser,
    * planned through the same Expand operator as cube/rollup). */
  def groupingSets(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.register(s, dir, "lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        |ORDER BY l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST""".stripMargin)
  }

  val groupingSetsSql: String =
    """SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
      |ORDER BY l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST""".stripMargin

  /** PIVOT: per-user event counts spread across one column per event
    * type. Explicit value list keeps the plan single-pass (no distinct
    * scan for values — the shape that survives scale); Spark pivot
    * yields null for empty cells where conditional aggregation yields 0,
    * so nulls are coalesced to match. */
  def pivotEvents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val types = Seq("click", "view", "purchase", "signup", "error")
    t(s, dir, "events")
      .groupBy($"user_id")
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .select($"user_id" +: types.map(tp => coalesce(col(tp), lit(0L)).as(tp)): _*)
      .orderBy($"user_id")
      .limit(100)
  }

  val pivotEventsSql: String =
    """SELECT user_id,
      |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
      |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
      |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
      |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
      |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
      |FROM events GROUP BY user_id ORDER BY user_id LIMIT 100""".stripMargin

  /** UNPIVOT (melt): wide per-part metrics to long (part, metric, val)
    * form — the inverse of [[pivotEvents]], used by pipelines that
    * normalize heterogeneous feature columns. Value columns are cast to
    * a common type first (unpivot requires it). */
  def unpivotPart(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "part")
      .select($"p_partkey",
        $"p_size".cast("long").as("size"),
        length($"p_name").cast("long").as("name_len"),
        length($"p_type").cast("long").as("type_len"))
      .unpivot(Array($"p_partkey"), Array($"size", $"name_len", $"type_len"),
        "metric", "val")
      .orderBy($"p_partkey", $"metric")
      .limit(300)
  }

  val unpivotPartSql: String =
    """SELECT p_partkey, metric, val FROM (
      |  SELECT p_partkey, 'size' AS metric, CAST(p_size AS BIGINT) AS val FROM part
      |  UNION ALL
      |  SELECT p_partkey, 'name_len', LENGTH(p_name) FROM part
      |  UNION ALL
      |  SELECT p_partkey, 'type_len', LENGTH(p_type) FROM part)
      |ORDER BY p_partkey, metric LIMIT 300""".stripMargin

  /** Six-way star/snowflake join (TPC-H Q5 shape): revenue by nation for
    * one region and date window. Bounded dims (region/nation) broadcast;
    * the SF-scaling sides (customer/orders/lineitem/supplier) are left
    * to AQE — at scale the fact table streams through hash joins keyed
    * on its own columns and only aggregated partials shuffle. */
  def snowflake(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
    val l = t(s, dir, "lineitem")
    val sup = t(s, dir, "supplier")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region").filter($"r_name" === "ASIA")
    c.join(o, $"c_custkey" === $"o_custkey")
      .join(l, $"l_orderkey" === $"o_orderkey")
      .join(sup, $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(sum($"l_extendedprice".cast("decimal(18,2)") *
          (lit(1).cast("decimal(9,2)") - $"l_discount".cast("decimal(9,2)")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"revenue".desc, $"n_name")
  }

  val snowflakeSql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |           (CAST(1 AS DECIMAL(9,2)) - CAST(l_discount AS DECIMAL(9,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1995-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  // --- Filters / predicates -------------------------------------------------

  /** Predicate family sweep: BETWEEN, IN, LIKE, CASE — all pushed to the
    * parquet scan where possible (PushedFilters in .explain). */
  def filterPredicates(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "part")
      .filter($"p_size".between(10, 30) &&
        $"p_brand".isin("Brand#1", "Brand#2", "Brand#3") &&
        $"p_type".like("%O%"))
      .select($"p_partkey", $"p_name", $"p_brand", $"p_size",
        when($"p_retailprice" > 1500, "premium")
          .when($"p_retailprice" > 1000, "standard")
          .otherwise("budget").as("price_tier"))
      .orderBy($"p_partkey")
  }

  val filterPredicatesSql: String =
    """SELECT p_partkey, p_name, p_brand, p_size,
      |  CASE WHEN p_retailprice > 1500 THEN 'premium'
      |       WHEN p_retailprice > 1000 THEN 'standard'
      |       ELSE 'budget' END AS price_tier
      |FROM part
      |WHERE p_size BETWEEN 10 AND 30
      |  AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      |  AND p_type LIKE '%O%'
      |ORDER BY p_partkey""".stripMargin

  /** DISTINCT projection = aggregate-without-aggregates; shuffles only the
    * two key columns after scan-level column pruning. */
  def distinctQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .select($"c_mktsegment", $"c_nationkey")
      .distinct()
      .orderBy($"c_mktsegment", $"c_nationkey")
  }

  val distinctSql: String =
    """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
      |ORDER BY c_mktsegment, c_nationkey""".stripMargin

  // --- Joins ----------------------------------------------------------------

  /** Orders ⋈ customer. No broadcast hint: customer grows with scale
    * factor, so a forced broadcast would OOM at 100× (VERDICT r2 item 1).
    * Left unhinted, AQE broadcasts it while it fits under
    * autoBroadcastJoinThreshold and falls back to shuffle join beyond. */
  def joinInner(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    o.join(c, o("o_custkey") === c("c_custkey"), "inner")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("revenue"))
      .orderBy($"c_mktsegment")
  }

  val joinInnerSql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** LEFT OUTER: every customer row survives; customers with no orders get
    * null-extended order columns (counted via the null-safe aggregate). */
  def joinLeft(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy($"c_custkey", $"c_mktsegment")
      .agg(count($"o_orderkey").as("n_orders"),
        coalesce(dsum($"o_totalprice"), lit(0.0)).as("spend"))
      .orderBy($"c_custkey")
      .limit(100)
  }

  val joinLeftSql: String =
    """SELECT c_custkey, c_mktsegment, COUNT(o_orderkey) AS n_orders,
      |  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS spend
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_mktsegment ORDER BY c_custkey LIMIT 100""".stripMargin

  /** RIGHT OUTER (mirror of left — planner canonicalizes to a left join
    * with sides swapped). */
  def joinRight(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    o.join(c, o("o_custkey") === c("c_custkey"), "right")
      .groupBy($"c_nationkey")
      .agg(count($"o_orderkey").as("n_orders"), count(lit(1)).as("n_rows"))
      .orderBy($"c_nationkey")
  }

  val joinRightSql: String =
    """SELECT c_nationkey, COUNT(o_orderkey) AS n_orders, COUNT(*) AS n_rows
      |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** FULL OUTER with asymmetric sides: positive-balance customers vs the
    * per-customer order rollup — rows appear with nulls on either side. */
  def joinFull(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = t(s, dir, "customer").filter($"c_acctbal" > 0)
      .select($"c_custkey", $"c_acctbal")
    val oa = t(s, dir, "orders").groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"))
    c.join(oa, c("c_custkey") === oa("o_custkey"), "full")
      .select(
        coalesce($"c_custkey", $"o_custkey").as("custkey"),
        $"c_acctbal".isNotNull.as("has_balance_row"),
        coalesce($"n_orders", lit(0L)).as("n_orders"))
      .orderBy($"custkey")
      .limit(200)
  }

  val joinFullSql: String =
    """WITH c AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 0),
      |  oa AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey)
      |SELECT COALESCE(c_custkey, o_custkey) AS custkey,
      |  c_acctbal IS NOT NULL AS has_balance_row,
      |  COALESCE(n_orders, 0) AS n_orders
      |FROM c FULL JOIN oa ON c_custkey = o_custkey
      |ORDER BY custkey LIMIT 200""".stripMargin

  /** LEFT SEMI: customers that placed at least one urgent order — probe side
    * streams, build side deduplicates; no row multiplication ever. */
  def joinSemi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter($"o_orderpriority" === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select($"c_custkey", $"c_mktsegment")
      .orderBy($"c_custkey")
      .limit(100)
  }

  val joinSemiSql: String =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey LIMIT 100""".stripMargin

  /** LEFT ANTI: customers that never placed an urgent order (the filter on
    * the build side makes the result non-trivial — every customer has SOME
    * order in this data). */
  def joinAnti(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter($"o_orderpriority" === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select($"c_custkey", $"c_nationkey", $"c_acctbal")
      .orderBy($"c_custkey")
      .limit(200)
  }

  val joinAntiSql: String =
    """SELECT c_custkey, c_nationkey, c_acctbal FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey LIMIT 200""".stripMargin

  /** CROSS JOIN (bounded sides): region × nation grid. */
  def joinCross(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val r = t(s, dir, "region").select($"r_regionkey", $"r_name")
    val n = t(s, dir, "nation").select($"n_nationkey", $"n_name")
    r.crossJoin(n)
      .select($"r_regionkey", $"n_nationkey", $"r_name", $"n_name")
      .orderBy($"r_regionkey", $"n_nationkey")
  }

  val joinCrossSql: String =
    """SELECT r_regionkey, n_nationkey, r_name, n_name
      |FROM region CROSS JOIN nation
      |ORDER BY r_regionkey, n_nationkey""".stripMargin

  /** Theta (non-equi) self-join: nation pairs within a region — the
    * inequality keeps it a nested-loop join over a broadcast side; the
    * equality on n_regionkey bounds the blow-up. */
  def joinTheta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n1 = t(s, dir, "nation").as("n1")
    val n2 = t(s, dir, "nation").as("n2")
    n1.join(n2, $"n1.n_regionkey" === $"n2.n_regionkey" &&
        $"n1.n_nationkey" < $"n2.n_nationkey")
      .select($"n1.n_regionkey".as("regionkey"),
        $"n1.n_name".as("nation_a"), $"n2.n_name".as("nation_b"))
      .orderBy($"regionkey", $"nation_a", $"nation_b")
  }

  val joinThetaSql: String =
    """SELECT n1.n_regionkey AS regionkey, n1.n_name AS nation_a, n2.n_name AS nation_b
      |FROM nation n1 JOIN nation n2
      |  ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
      |ORDER BY regionkey, nation_a, nation_b""".stripMargin

  /** Equi-join with a range residual (band join): lineitem ⋈ part on key
    * plus a quantity/size band — the equi key drives the hash join, the
    * band is a cheap residual filter (no blow-up at any scale). Part is
    * SF-scaling, so no broadcast hint — AQE decides (VERDICT r2 item 1). */
  def joinRange(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = t(s, dir, "lineitem")
    val p = t(s, dir, "part")
    l.join(p, l("l_partkey") === p("p_partkey") &&
        l("l_quantity").between(p("p_size") - 5, p("p_size") + 5))
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_in_band"), sum($"l_quantity").as("qty_in_band"))
      .orderBy($"p_brand")
  }

  val joinRangeSql: String =
    """SELECT p_brand, COUNT(*) AS n_in_band, SUM(l_quantity) AS qty_in_band
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |  AND l_quantity BETWEEN p_size - 5 AND p_size + 5
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** Multi-way star join: fact (lineitem) against three dims in one
    * pipeline — at cluster scale only the fact side streams. The bounded
    * dims (nation 25 rows, region 5) are hinted broadcast; supplier
    * scales with SF (SF×10k rows), so AQE decides its strategy at
    * runtime — broadcast while it fits, shuffled hash join beyond. */
  def joinMultiway(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = t(s, dir, "lineitem")
    val sup = t(s, dir, "supplier")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    l.join(sup, l("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy($"r_name")
      .agg(dsum($"l_extendedprice").as("revenue"), count(lit(1)).as("n_items"))
      .orderBy($"r_name")
  }

  val joinMultiwaySql: String =
    """SELECT r_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  // --- Sort / limit / offset ------------------------------------------------

  /** ORDER BY + LIMIT fuses into TakeOrderedAndProject: each partition keeps
    * a k-sized heap, only k rows per partition reach the driver — no global
    * sort at any scale. Tie-broken on the key for cross-engine determinism. */
  def sortLimit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .select($"o_orderkey", $"o_totalprice", $"o_orderdate")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(10)
  }

  val sortLimitSql: String =
    """SELECT o_orderkey, o_totalprice, o_orderdate
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin

  /** q_sort_nulls entry: NULL-ORDERING parity — the cross-engine trap
    * this suite exists to pin: Spark's default is NULLS FIRST on ASC /
    * NULLS LAST on DESC, DuckDB's default is NULLS LAST everywhere, so
    * any ORDER BY over a nullable key silently disagrees unless the
    * placement is EXPLICIT. This query spells out all four combinations
    * (asc/desc × nulls first/last) over a key that is genuinely null
    * (clerk numbers nulled for every 7th order) and ranks with each —
    * a pipeline that copies its ORDER BY between engines without the
    * NULLS clause gets a red diff here, which is the point. */
  def sortNulls(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
      .select($"o_orderkey",
        when($"o_orderkey" % 7 === 0, lit(null).cast("long"))
          .otherwise($"o_orderkey" % 100).as("k"))
      .filter($"o_orderkey" <= 400)
    val base = Seq(
      ("asc_nulls_first", $"k".asc_nulls_first),
      ("asc_nulls_last", $"k".asc_nulls_last),
      ("desc_nulls_first", $"k".desc_nulls_first),
      ("desc_nulls_last", $"k".desc_nulls_last))
    base.map { case (name, ord) =>
      o.select(lit(name).as("ordering"), $"o_orderkey", $"k")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(lit(0)).orderBy(ord, $"o_orderkey".asc)))
        .filter($"rn" <= 5)
    }.reduce(_ unionByName _)
      .withColumn("rn", $"rn".cast("long"))
      .orderBy($"ordering", $"rn")
  }

  val sortNullsSql: String = {
    def one(name: String, clause: String): String =
      s"""SELECT ordering, o_orderkey, k, rn FROM (
         |  SELECT '$name' AS ordering, o_orderkey, k,
         |    ROW_NUMBER() OVER (ORDER BY $clause, o_orderkey ASC) AS rn
         |  FROM b) WHERE rn <= 5""".stripMargin
    s"""WITH b AS (
       |  SELECT o_orderkey,
       |    CASE WHEN o_orderkey % 7 = 0 THEN NULL
       |         ELSE o_orderkey % 100 END AS k
       |  FROM orders WHERE o_orderkey <= 400)
       |${one("asc_nulls_first", "k ASC NULLS FIRST")}
       |UNION ALL
       |${one("asc_nulls_last", "k ASC NULLS LAST")}
       |UNION ALL
       |${one("desc_nulls_first", "k DESC NULLS FIRST")}
       |UNION ALL
       |${one("desc_nulls_last", "k DESC NULLS LAST")}
       |ORDER BY ordering, rn""".stripMargin
  }

  /** LIMIT + OFFSET pagination over a total order. */
  def limitOffset(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .select($"c_custkey", $"c_name", $"c_acctbal")
      .orderBy($"c_acctbal".desc, $"c_custkey".asc)
      .offset(20)
      .limit(10)
  }

  val limitOffsetSql: String =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 10 OFFSET 20""".stripMargin

  // --- Subqueries / CTEs ----------------------------------------------------

  /** Scalar subquery: orders above the global average price. Spark plans the
    * aggregate as a broadcast scalar (one extra tiny job), not a per-row
    * recompute. */
  def scalarSubquery(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.register(s, dir, "orders")
    s.sql(
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice > 1.8 * (SELECT AVG(o_totalprice) FROM orders)
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin)
  }

  val scalarSubquerySql: String =
    """SELECT o_orderkey, o_totalprice
      |FROM orders
      |WHERE o_totalprice > 1.8 * (SELECT AVG(o_totalprice) FROM orders)
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin

  /** Correlated subquery (decorrelated by Catalyst to a join): customers
    * whose balance exceeds their nation's average. */
  def correlatedSubquery(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.register(s, dir, "customer")
    s.sql(
      """SELECT c_custkey, c_nationkey, c_acctbal
        |FROM customer c1
        |WHERE c_acctbal > (SELECT AVG(c_acctbal) + 2000 FROM customer c2
        |                   WHERE c2.c_nationkey = c1.c_nationkey)
        |ORDER BY c_custkey""".stripMargin)
  }

  val correlatedSubquerySql: String =
    """SELECT c_custkey, c_nationkey, c_acctbal
      |FROM customer c1
      |WHERE c_acctbal > (SELECT AVG(c_acctbal) + 2000 FROM customer c2
      |                   WHERE c2.c_nationkey = c1.c_nationkey)
      |ORDER BY c_custkey""".stripMargin

  /** CTE pipeline: two named stages composed (Spark inlines them — no
    * materialization barrier, full pushdown through the CTE boundary). */
  def cte(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.register(s, dir, "orders", "customer")
    s.sql(
      """WITH big_orders AS (
        |  SELECT o_custkey, COUNT(*) AS n FROM orders
        |  WHERE o_totalprice > 100000 GROUP BY o_custkey),
        |seg AS (SELECT c_custkey, c_mktsegment FROM customer)
        |SELECT c_mktsegment, CAST(SUM(n) AS BIGINT) AS big_order_count
        |FROM big_orders JOIN seg ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }

  // CAST(SUM(n) AS BIGINT) on BOTH sides: DuckDB widens SUM(BIGINT) to
  // HUGEINT (fetched as float64 by the oracle harness) while Spark keeps
  // BIGINT — the cast is a no-op for Spark and pins DuckDB back to int64.
  val cteSql: String =
    """WITH big_orders AS (
      |  SELECT o_custkey, COUNT(*) AS n FROM orders
      |  WHERE o_totalprice > 100000 GROUP BY o_custkey),
      |seg AS (SELECT c_custkey, c_mktsegment FROM customer)
      |SELECT c_mktsegment, CAST(SUM(n) AS BIGINT) AS big_order_count
      |FROM big_orders JOIN seg ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Recursive CTE (Spark 4's WITH RECURSIVE): walk the implicit binary
    * tree over small part keys (children of n are 2n and 2n+1), emitting
    * (node, depth, path-min ancestor). Tier-D breadth: DataFusion's
    * sqlparser accepts RECURSIVE, and Spark 4 executes it natively —
    * each iteration is one distributed join of the frontier against the
    * (pruned, pushed-down) base relation, frontier size bounded by the
    * tree level, rounds bounded by the depth. */
  def recursiveCte(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.register(s, dir, "part")
    s.sql(
      """WITH RECURSIVE walk(node, depth) AS (
        |  SELECT CAST(1 AS BIGINT), 0
        |  UNION ALL
        |  SELECT p.p_partkey, w.depth + 1
        |  FROM walk w JOIN part p
        |    ON p.p_partkey = w.node * 2 OR p.p_partkey = w.node * 2 + 1
        |  WHERE p.p_partkey < 64)
        |SELECT CAST(node AS BIGINT) AS node, CAST(depth AS INT) AS depth
        |FROM walk ORDER BY node""".stripMargin)
  }

  val recursiveCteSql: String =
    """WITH RECURSIVE walk(node, depth) AS (
      |  SELECT CAST(1 AS BIGINT), 0
      |  UNION ALL
      |  SELECT p.p_partkey, w.depth + 1
      |  FROM walk w JOIN part p
      |    ON p.p_partkey = w.node * 2 OR p.p_partkey = w.node * 2 + 1
      |  WHERE p.p_partkey < 64)
      |SELECT CAST(node AS BIGINT) AS node, CAST(depth AS INT) AS depth
      |FROM walk ORDER BY node""".stripMargin

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): nulls are
    * planted on both sides in-query (every 20th supplier nation, every
    * 4th nation key) and must MATCH each other — the semantics plain
    * `=` silently drops. Null-safe equi-keys still hash-partition
    * (null is just another key value), so the join stays a shuffle/
    * broadcast HASH join, not a nested loop. */
  def joinNullSafe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sup = t(s, dir, "supplier")
      .select($"s_suppkey",
        when($"s_suppkey" % 20 === 0, lit(null)).otherwise($"s_nationkey")
          .as("nk"))
    val nat = t(s, dir, "nation")
      .select(when($"n_nationkey" % 4 === 0, lit(null))
        .otherwise($"n_nationkey").as("nk2"), $"n_name")
    sup.join(nat, $"nk" <=> $"nk2")
      .groupBy(coalesce($"n_name", lit("<null-key>")).as("n_name"))
      .agg(count(lit(1)).as("n_suppliers"))
      .orderBy($"n_name")
  }

  val joinNullSafeSql: String =
    """WITH sup AS (
      |  SELECT s_suppkey,
      |    CASE WHEN s_suppkey % 20 = 0 THEN NULL ELSE s_nationkey END AS nk
      |  FROM supplier),
      |nat AS (
      |  SELECT CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_nationkey END AS nk2,
      |         n_name
      |  FROM nation)
      |SELECT COALESCE(n_name, '<null-key>') AS n_name,
      |       CAST(count(*) AS BIGINT) AS n_suppliers
      |FROM sup JOIN nat ON nk IS NOT DISTINCT FROM nk2
      |GROUP BY 1 ORDER BY n_name""".stripMargin

  /** NOT IN vs NOT EXISTS under nulls — the classic three-valued-logic
    * trap: a single NULL in the NOT IN subquery empties the result,
    * while NOT EXISTS keeps the expected rows. Both engines implement
    * the standard; the query emits both counts so the parity (and the
    * trap) is hash-pinned. */
  def notInNulls(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.register(s, dir, "customer", "orders")
    s.sql(
      """WITH custkeys AS (
        |  SELECT CASE WHEN o_orderkey % 1000 = 0 THEN NULL
        |              ELSE o_custkey END AS k
        |  FROM orders),
        |not_in AS (
        |  SELECT count(*) AS n FROM customer
        |  WHERE c_custkey NOT IN (SELECT k FROM custkeys)),
        |not_exists AS (
        |  SELECT count(*) AS n FROM customer c
        |  WHERE NOT EXISTS (SELECT 1 FROM custkeys WHERE k = c_custkey))
        |SELECT CAST(not_in.n AS BIGINT) AS n_not_in,
        |       CAST(not_exists.n AS BIGINT) AS n_not_exists
        |FROM not_in, not_exists""".stripMargin)
  }

  val notInNullsSql: String =
    """WITH custkeys AS (
      |  SELECT CASE WHEN o_orderkey % 1000 = 0 THEN NULL
      |              ELSE o_custkey END AS k
      |  FROM orders),
      |not_in AS (
      |  SELECT count(*) AS n FROM customer
      |  WHERE c_custkey NOT IN (SELECT k FROM custkeys)),
      |not_exists AS (
      |  SELECT count(*) AS n FROM customer c
      |  WHERE NOT EXISTS (SELECT 1 FROM custkeys WHERE k = c_custkey))
      |SELECT CAST(not_in.n AS BIGINT) AS n_not_in,
      |       CAST(not_exists.n AS BIGINT) AS n_not_exists
      |FROM not_in, not_exists""".stripMargin

  /** LATERAL correlated subquery (Spark 3.2+/DuckDB): per-nation top-2
    * suppliers by account balance — the per-row-subquery formulation
    * Catalyst decorrelates into a ranked join rather than executing
    * per outer row. */
  def lateralTopN(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.register(s, dir, "supplier", "nation")
    s.sql(
      """SELECT n_name, s_name, s_acctbal
        |FROM nation,
        |LATERAL (
        |  SELECT s_name, s_acctbal FROM supplier
        |  WHERE s_nationkey = n_nationkey
        |  ORDER BY s_acctbal DESC, s_name LIMIT 2)
        |ORDER BY n_name, s_acctbal DESC, s_name""".stripMargin)
  }

  val lateralTopNSql: String =
    """SELECT n_name, s_name, s_acctbal
      |FROM nation,
      |LATERAL (
      |  SELECT s_name, s_acctbal FROM supplier
      |  WHERE s_nationkey = n_nationkey
      |  ORDER BY s_acctbal DESC, s_name LIMIT 2)
      |ORDER BY n_name, s_acctbal DESC, s_name""".stripMargin

  // --- registry -------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> q1PricingSummary,
    "q_agg_argmax" -> aggArgmax,
    "q_agg_distinct" -> aggDistinct,
    "q_agg_stats" -> aggStats,
    "q_agg_stats2" -> aggStats2,
    "q_agg_approx_distinct" -> approxDistinct,
    "q_agg_approx_quantiles" -> approxQuantiles,
    "q_pivot" -> pivotEvents,
    "q_unpivot" -> unpivotPart,
    "q_join_snowflake" -> snowflake,
    "q_agg_having" -> aggHaving,
    "q_rollup" -> rollup,
    "q_cube" -> cube,
    "q_grouping_sets" -> groupingSets,
    "q_filter_predicates" -> filterPredicates,
    "q_distinct" -> distinctQ,
    "q_join_inner" -> joinInner,
    "q_join_left" -> joinLeft,
    "q_join_right" -> joinRight,
    "q_join_full" -> joinFull,
    "q_join_semi" -> joinSemi,
    "q_join_anti" -> joinAnti,
    "q_join_cross" -> joinCross,
    "q_join_theta" -> joinTheta,
    "q_join_range" -> joinRange,
    "q_join_multiway" -> joinMultiway,
    "q_sort_limit" -> sortLimit,
    "q_sort_nulls" -> sortNulls,
    "q_limit_offset" -> limitOffset,
    "q_scalar_subquery" -> scalarSubquery,
    "q_correlated_subquery" -> correlatedSubquery,
    "q_cte" -> cte,
    "q_recursive_cte" -> recursiveCte,
    "q_join_nullsafe" -> joinNullSafe,
    "q_not_in_nulls" -> notInNulls,
    "q_lateral_topn" -> lateralTopN)

  def oracle: Map[String, String] = Map(
    "q1_pricing_summary" -> q1PricingSummarySql,
    "q_agg_argmax" -> aggArgmaxSql,
    "q_agg_distinct" -> aggDistinctSql,
    "q_agg_stats" -> aggStatsSql,
    "q_agg_stats2" -> aggStats2Sql,
    "q_agg_approx_distinct" -> approxDistinctSql,
    "q_agg_approx_quantiles" -> approxQuantilesSql,
    "q_pivot" -> pivotEventsSql,
    "q_unpivot" -> unpivotPartSql,
    "q_join_snowflake" -> snowflakeSql,
    "q_agg_having" -> aggHavingSql,
    "q_rollup" -> rollupSql,
    "q_cube" -> cubeSql,
    "q_grouping_sets" -> groupingSetsSql,
    "q_filter_predicates" -> filterPredicatesSql,
    "q_distinct" -> distinctSql,
    "q_join_inner" -> joinInnerSql,
    "q_join_left" -> joinLeftSql,
    "q_join_right" -> joinRightSql,
    "q_join_full" -> joinFullSql,
    "q_join_semi" -> joinSemiSql,
    "q_join_anti" -> joinAntiSql,
    "q_join_cross" -> joinCrossSql,
    "q_join_theta" -> joinThetaSql,
    "q_join_range" -> joinRangeSql,
    "q_join_multiway" -> joinMultiwaySql,
    "q_sort_limit" -> sortLimitSql,
    "q_sort_nulls" -> sortNullsSql,
    "q_limit_offset" -> limitOffsetSql,
    "q_scalar_subquery" -> scalarSubquerySql,
    "q_correlated_subquery" -> correlatedSubquerySql,
    "q_cte" -> cteSql,
    "q_recursive_cte" -> recursiveCteSql,
    "q_join_nullsafe" -> joinNullSafeSql,
    "q_not_in_nulls" -> notInNullsSql,
    "q_lateral_topn" -> lateralTopNSql)
}
