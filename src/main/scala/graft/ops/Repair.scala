package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Data-repair operators — the cleaning pass between ingestion and
  * training: impute missing numerics from group statistics, clip
  * outliers to robust bounds. The test tables carry no nulls or
  * injected junk, so each query plants a deterministic defect pattern
  * in-query (same construction in the oracle) and repairs it — the
  * repair logic, not the defect, is what's under test.
  *
  * Determinism: every statistic that feeds a repair comes from EXACT
  * arithmetic (decimal sums for means, the ordered-row definition for
  * percentiles) so both engines repair with bit-identical fill values.
  *
  * Scale shapes:
  *  - [[imputeQ]]: one map-side-combinable groupBy for the means +
  *    a broadcast stats join — two scan-speed passes, no sort.
  *  - [[winsorizeQ]]: per-group p05/p95 via ONE sort-within-group
  *    window pass (rank against count), then a broadcast bounds join;
  *    the clip itself is a pure map.
  */
object Repair {

  /** Null every 10th value (by event_id) and impute per-type means
    * computed over the SURVIVING values; report per-type imputation
    * accounting plus an order-independent checksum of the repaired
    * column so the oracle verifies every repaired row, not just the
    * counts. */
  def imputeQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dam = t(s, dir, "events")
      .select($"event_id", $"event_type",
        when($"event_id" % 10 === 0, lit(null)).otherwise($"value")
          .as("v"))
    // fill = exact decimal sum cast to double ÷ exact count: ONE IEEE
    // division, identical on both engines (native decimal division
    // rounds differently per engine)
    val stats = dam.groupBy($"event_type")
      .agg((sum($"v".cast("decimal(18,6)")).cast("double") /
        count($"v")).as("fill"))
    dam.join(broadcast(stats), "event_type")
      .select($"event_type", $"v",
        coalesce($"v", $"fill").as("repaired"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"v".isNull.cast("long")).as("n_imputed"),
        round(max($"repaired") - min($"repaired"), 6).as("range_after"),
        // round-to-6dp FIRST (half-away-from-zero, identical in both
        // engines), THEN the exact decimal cast — a raw double→DECIMAL
        // cast rounds at the 6th decimal with engine-dependent tie
        // behavior (the repo-wide FP parity contract)
        sum(round($"repaired", 6).cast("decimal(18,6)")).cast("decimal(28,6)")
          .as("sum_after"))
      .orderBy($"event_type")
  }

  val imputeSql: String =
    """WITH dam AS (
      |  SELECT event_id, event_type,
      |    CASE WHEN event_id % 10 = 0 THEN NULL ELSE value END AS v
      |  FROM events),
      |st AS (
      |  SELECT event_type,
      |    CAST(sum(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / count(v) AS fill
      |  FROM dam GROUP BY event_type),
      |r AS (
      |  SELECT dam.event_type, v,
      |    COALESCE(v, fill) AS repaired
      |  FROM dam JOIN st USING (event_type))
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_imputed,
      |  round(max(repaired) - min(repaired), 6) AS range_after,
      |  CAST(sum(CAST(round(repaired, 6) AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS sum_after
      |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Winsorize per-type values at the exact p05/p95 ordered-row bounds
    * (rank r of n: p-quantile row = the value whose rank equals
    * ceil(p·n), ties broken by event_id — an exact, engine-neutral
    * definition, unlike interpolated quantiles whose FP differs).
    * Report clip accounting and exact decimal sums before/after. */
  def winsorizeQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val ev = t(s, dir, "events").select($"event_id", $"event_type", $"value")
    val w = Window.partitionBy($"event_type").orderBy($"value", $"event_id")
    val ranked = ev
      .withColumn("r", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"event_type")))
    val bounds = ranked
      .filter($"r" === ceil($"n" * 0.05) || $"r" === ceil($"n" * 0.95))
      .groupBy($"event_type")
      .agg(min($"value").as("lo"), max($"value").as("hi"))
    ev.join(broadcast(bounds), "event_type")
      .select($"event_type", $"value",
        least(greatest($"value", $"lo"), $"hi").as("clipped"),
        ($"value" < $"lo" || $"value" > $"hi").cast("long").as("was_clipped"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"was_clipped").as("n_clipped"),
        min($"clipped").as("v_lo"), max($"clipped").as("v_hi"),
        // round-then-cast, same parity contract as imputeQ above
        sum(round($"clipped", 6).cast("decimal(18,6)")).cast("decimal(28,6)")
          .as("sum_after"))
      .orderBy($"event_type")
  }

  val winsorizeSql: String =
    """WITH ranked AS (
      |  SELECT event_type, event_id, value,
      |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS r,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM events),
      |b AS (
      |  SELECT event_type, min(value) AS lo, max(value) AS hi
      |  FROM ranked
      |  WHERE r = CAST(ceil(n * 0.05) AS BIGINT) OR r = CAST(ceil(n * 0.95) AS BIGINT)
      |  GROUP BY event_type),
      |c AS (
      |  SELECT e.event_type, value,
      |    least(greatest(value, lo), hi) AS clipped,
      |    CASE WHEN value < lo OR value > hi THEN 1 ELSE 0 END AS was_clipped
      |  FROM events e JOIN b USING (event_type))
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(was_clipped) AS BIGINT) AS n_clipped,
      |  min(clipped) AS v_lo, max(clipped) AS v_hi,
      |  CAST(sum(CAST(round(clipped, 6) AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS sum_after
      |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_repair_impute" -> imputeQ,
    "q_repair_winsorize" -> winsorizeQ)

  def oracle: Map[String, String] = Map(
    "q_repair_impute" -> imputeSql,
    "q_repair_winsorize" -> winsorizeSql)
}
