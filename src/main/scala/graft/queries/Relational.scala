package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  *    exact for any order at these magnitudes.
  */
object Relational {

  /** sum(cents-valued double) exactly: via decimal, back to double. */
  private def dsum(c: org.apache.spark.sql.Column) =
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

  // --- Join (inner equi) ---------------------------------------------------

  /** Orders ⋈ customer with a small dimension side: `broadcast()` avoids
    * shuffling the fact table — at 100 TB the orders side never moves. */
  def joinInner(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "inner")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("revenue"))
      .orderBy($"c_mktsegment")
  }

  val joinInnerSql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // --- Sort / limit (top-k) -------------------------------------------------

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

  // --- registry -------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> q1PricingSummary,
    "q_join_inner" -> joinInner,
    "q_sort_limit" -> sortLimit)

  def oracle: Map[String, String] = Map(
    "q1_pricing_summary" -> q1PricingSummarySql,
    "q_join_inner" -> joinInnerSql,
    "q_sort_limit" -> sortLimitSql)
}
