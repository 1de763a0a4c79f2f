package graft.ops

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality rule validation — the expectation-suite
  * gate a pipeline runs on every ingestion batch BEFORE data is
  * admitted downstream (range checks, domain membership, nullability,
  * temporal bounds). The report is per-rule violation accounting, not
  * pass/fail alone, so a 0.01%-violating batch is distinguishable from
  * a 40%-violating one.
  *
  * Shape: every rule is a boolean Column, so the whole suite compiles
  * into ONE whole-stage-codegen aggregate over ONE scan — adding a rule
  * adds a conditional sum, not a pass. `stack` pivots the 1-row result
  * into a row per rule. At 100 TB this is exactly one table read,
  * mergeable map-side like any sum. */
object Validate {

  /** One rule: name + the VIOLATION predicate (true = row fails). */
  final case class Rule(name: String, violated: Column)

  /** Per-rule accounting over `df`: (rule_name, n_checked, n_violations,
    * viol_frac). One scan regardless of rule count. */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs = count(lit(1)).as("graft_n") +:
      rules.map(r => sum(r.violated.cast("long")).as(s"graft_v_${r.name}"))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val cells = rules.map(r =>
      s"'${r.name}', graft_n, graft_v_${r.name}").mkString(",\n")
    one.selectExpr(
      s"""stack(${rules.length},
         |$cells
         |) AS (rule_name, n_checked, n_violations)""".stripMargin)
      .selectExpr("rule_name", "n_checked", "n_violations",
        "round(CAST(n_violations AS DOUBLE) / n_checked, 6) AS viol_frac")
      .orderBy("rule_name")
  }

  /** q_validate_rules entry: a five-rule suite over lineitem — two
    * deliberately tight numeric ranges (real violations to count), a
    * domain check, a temporal lower bound, and a nullability check. */
  def rulesQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    report(t(s, dir, "lineitem"), Seq(
      Rule("quantity_in_1_45", !$"l_quantity".between(1, 45)),
      Rule("discount_le_8pct", !$"l_discount".between(0, 0.08)),
      Rule("returnflag_domain", !$"l_returnflag".isin("A", "N", "R")),
      Rule("shipdate_after_1992", $"l_shipdate" < to_timestamp(lit("1992-01-01"))),
      Rule("orderkey_not_null", $"l_orderkey".isNull)))
  }

  val rulesSql: String =
    """WITH a AS (
      |  SELECT COUNT(*) AS n,
      |    SUM(CASE WHEN NOT (l_quantity BETWEEN 1 AND 45) THEN 1 ELSE 0 END) AS v_qty,
      |    SUM(CASE WHEN NOT (l_discount BETWEEN 0 AND 0.08) THEN 1 ELSE 0 END) AS v_disc,
      |    SUM(CASE WHEN NOT (l_returnflag IN ('A','N','R')) THEN 1 ELSE 0 END) AS v_flag,
      |    SUM(CASE WHEN l_shipdate < TIMESTAMP '1992-01-01' THEN 1 ELSE 0 END) AS v_date,
      |    SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS v_null
      |  FROM lineitem),
      |u AS (
      |  SELECT 'quantity_in_1_45' AS rule_name, n, CAST(v_qty AS BIGINT) AS n_violations FROM a
      |  UNION ALL SELECT 'discount_le_8pct', n, CAST(v_disc AS BIGINT) FROM a
      |  UNION ALL SELECT 'returnflag_domain', n, CAST(v_flag AS BIGINT) FROM a
      |  UNION ALL SELECT 'shipdate_after_1992', n, CAST(v_date AS BIGINT) FROM a
      |  UNION ALL SELECT 'orderkey_not_null', n, CAST(v_null AS BIGINT) FROM a)
      |SELECT rule_name, n AS n_checked, n_violations,
      |  ROUND(CAST(n_violations AS DOUBLE) / n, 6) AS viol_frac
      |FROM u ORDER BY rule_name""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_validate_rules" -> rulesQ)

  def oracle: Map[String, String] = Map(
    "q_validate_rules" -> rulesSql)
}
