package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Time-series resampling — irregular event streams onto a REGULAR
  * grid, the shape monitoring, feature windows, and forecasting inputs
  * all require: one row per (hour, series) whether or not data arrived,
  * with gaps forward-filled from the last observation.
  *
  * Scale shape: the grid is `explode(sequence(start, end, interval))` ×
  * a broadcast series dimension — generated, never stored, and sized
  * by the TIME RANGE (720 hours/month), not the data. The hourly
  * aggregate is map-side-combinable; the forward fill is one
  * `last(ignoreNulls)` window per series ordered by hour — state is a
  * single value per series, the exact streaming-friendly shape.
  * Determinism: hourly means divide an exact decimal sum by an exact
  * count (one shared IEEE division), and the fill copies prior
  * values bit-for-bit. */
object TimeSeries {

  def resampleQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hourly = t(s, dir, "events")
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n_obs"),
        (sum($"value".cast("decimal(18,6)")).cast("double") /
          count(lit(1))).as("mean_v"))
    val grid = s.sql(
      """SELECT explode(sequence(timestamp'2024-01-01 00:00:00',
        |  timestamp'2024-01-30 23:00:00', interval 1 hour)) AS hour"""
        .stripMargin)
    val series = t(s, dir, "events").select($"event_type").distinct()
    val w = Window.partitionBy($"event_type").orderBy($"hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.crossJoin(broadcast(series))
      .join(hourly, Seq("hour", "event_type"), "left")
      .select($"hour", $"event_type",
        coalesce($"n_obs", lit(0L)).as("n_obs"),
        $"mean_v".isNull.cast("int").as("gap"),
        round(last($"mean_v", ignoreNulls = true).over(w), 6).as("v_filled"))
      .filter($"event_type" <= "error") // bound the dump: 2 of 5 series
      .orderBy($"event_type", $"hour")
  }

  val resampleSql: String =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS hour, event_type,
      |    CAST(count(*) AS BIGINT) AS n_obs,
      |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS mean_v
      |  FROM events GROUP BY 1, 2),
      |grid AS (
      |  SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
      |    TIMESTAMP '2024-01-30 23:00:00', INTERVAL 1 HOUR)) AS hour),
      |series AS (SELECT DISTINCT event_type FROM events),
      |g AS (
      |  SELECT grid.hour, series.event_type, hourly.n_obs, hourly.mean_v
      |  FROM grid CROSS JOIN series
      |  LEFT JOIN hourly ON hourly.hour = grid.hour
      |    AND hourly.event_type = series.event_type)
      |SELECT hour, event_type,
      |  COALESCE(n_obs, 0) AS n_obs,
      |  CAST(mean_v IS NULL AS INT) AS gap,
      |  round(last_value(mean_v IGNORE NULLS) OVER (
      |    PARTITION BY event_type ORDER BY hour
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS v_filled
      |FROM g WHERE event_type <= 'error' ORDER BY event_type, hour""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ts_resample" -> resampleQ)

  def oracle: Map[String, String] = Map(
    "q_ts_resample" -> resampleSql)
}
