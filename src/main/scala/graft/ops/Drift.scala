package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Distribution-drift monitoring over `events` — the pipeline-health op
  * a large-scale ingestion system runs continuously: has the category
  * mix of what we're ingesting shifted vs a reference window?
  *
  * Metric: per-category PSI terms (population stability index),
  * (p − q) · ln(p / q) for the reference (first half of the month) vs
  * current (second half) share of each event type; Σ terms ≥ 0.2 is the
  * classic "investigate" threshold. KL divergence is the same plan with
  * p · ln(p / q) — PSI is preferred operationally because it is
  * symmetric-ish and finite when categories shrink.
  *
  * Scale shape: one map-side-combinable groupBy(event_type) with two
  * conditional counts (the window split is a projection, not a
  * self-join), then a broadcast 1-row cross join for the totals —
  * O(|categories|) rows after the first aggregate, no second pass over
  * the data, no driver-side collect. At 100 TB this is a single
  * scan-speed aggregation.
  *
  * Determinism: counts are exact integers; shares and the ln() run the
  * same IEEE double ops in the same order on both engines.
  */
object Drift {

  def psi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = t(s, dir, "events")
      .groupBy($"event_type")
      .agg(
        sum(when($"ts" < lit("2024-01-16").cast("timestamp"), 1L).otherwise(0L))
          .as("n_ref"),
        sum(when($"ts" >= lit("2024-01-16").cast("timestamp"), 1L).otherwise(0L))
          .as("n_cur"))
    val totals = counts.agg(
      sum($"n_ref").as("tot_ref"), sum($"n_cur").as("tot_cur"))
    val p = $"n_ref".cast("double") / $"tot_ref".cast("double")
    val q = $"n_cur".cast("double") / $"tot_cur".cast("double")
    counts.crossJoin(broadcast(totals))
      .select($"event_type", $"n_ref", $"n_cur",
        round(p, 6).as("share_ref"),
        round(q, 6).as("share_cur"),
        round((p - q) * log(p / q), 6).as("psi_term"))
      .orderBy($"event_type")
  }

  val psiSql: String =
    """WITH c AS (
      |  SELECT event_type,
      |    CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
      |    CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
      |  FROM events GROUP BY event_type),
      |t AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS tot_ref,
      |             CAST(SUM(n_cur) AS BIGINT) AS tot_cur FROM c)
      |SELECT event_type, n_ref, n_cur,
      |  ROUND(CAST(n_ref AS DOUBLE) / CAST(tot_ref AS DOUBLE), 6) AS share_ref,
      |  ROUND(CAST(n_cur AS DOUBLE) / CAST(tot_cur AS DOUBLE), 6) AS share_cur,
      |  ROUND((CAST(n_ref AS DOUBLE) / CAST(tot_ref AS DOUBLE)
      |         - CAST(n_cur AS DOUBLE) / CAST(tot_cur AS DOUBLE))
      |        * ln((CAST(n_ref AS DOUBLE) / CAST(tot_ref AS DOUBLE))
      |              / (CAST(n_cur AS DOUBLE) / CAST(tot_cur AS DOUBLE))), 6) AS psi_term
      |FROM c, t ORDER BY event_type""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_drift_psi" -> psi)

  def oracle: Map[String, String] = Map(
    "q_drift_psi" -> psiSql)
}
