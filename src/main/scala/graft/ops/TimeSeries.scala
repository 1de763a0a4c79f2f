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

  /** EWMA smoothing of an irregular series — the monitoring /
    * feature-engineering primitive: per series, an exponentially
    * time-decayed weighted mean of the last 20 HOURS of observations
    * (weight 0.7^Δh, normalized). Decay runs on TIME distance, not row
    * lag, so a gap hour decays the signal exactly as a calendar hour
    * should — row-lag EWMA silently stretches its half-life across
    * gaps.
    *
    * Scale shape: the hourly pre-aggregate is map-side-combinable and
    * collapses the stream to |series| × |hours| rows; the decay pass is
    * a BANDED interval self-join on (series, hour-bucket distance ≤ 19)
    * — per-row fan-out is a constant 20, never the series length, and
    * the weighted sum is again a plain combinable aggregate. No window
    * over the full series, no per-row state: the same plan shape works
    * on a 10-year stream. Determinism: weights are pow(0.7, integer Δh)
    * — identical in both engines — over identical hourly means (exact
    * decimal sum / count), summed then rounded to 6 dp (the ~1e-15
    * summation-order jitter sits 9 orders below the rounding grain). */
  def ewmaQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hourly = t(s, dir, "events")
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg((sum($"value".cast("decimal(18,6)")).cast("double") /
        count(lit(1))).as("v"))
      .filter($"event_type" <= "error") // bound the dump: 2 of 5 series
    val h = hourly.withColumn("hb",
      (unix_timestamp($"hour") / 3600L).cast("long"))
    // banded: bucket width = band width (20h), so a row's lookback window
    // spans at most its own and the previous bucket — the join is an
    // EQUI-join on (series, bucket) with the range as residual, exactly
    // the q_join_interval shape; no series-wide key, no NLJ at scale
    val a = h.withColumn("bk",
      explode(array(floor($"hb" / 20), floor($"hb" / 20) - 1)))
    val b = h.withColumn("bk", floor($"hb" / 20))
    a.as("a").join(b.as("b"),
        $"a.event_type" === $"b.event_type" && $"a.bk" === $"b.bk" &&
          $"b.hb".between($"a.hb" - 19, $"a.hb"))
      .groupBy($"a.event_type".as("event_type"), $"a.hour".as("hour"))
      .agg(round(
        sum($"b.v" * pow(lit(0.7), ($"a.hb" - $"b.hb").cast("double"))) /
          sum(pow(lit(0.7), ($"a.hb" - $"b.hb").cast("double"))), 6)
        .as("ewma"))
      .orderBy($"event_type", $"hour")
  }

  val ewmaSql: String =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS hour, event_type,
      |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS v
      |  FROM events GROUP BY 1, 2),
      |h AS (
      |  SELECT hour, event_type, v,
      |    CAST(epoch(hour) / 3600 AS BIGINT) AS hb
      |  FROM hourly WHERE event_type <= 'error')
      |SELECT a.event_type, a.hour,
      |  ROUND(SUM(b.v * pow(0.7, CAST(a.hb - b.hb AS DOUBLE)))
      |    / SUM(pow(0.7, CAST(a.hb - b.hb AS DOUBLE))), 6) AS ewma
      |FROM h a JOIN h b ON a.event_type = b.event_type
      |  AND b.hb BETWEEN a.hb - 19 AND a.hb
      |GROUP BY a.event_type, a.hour
      |ORDER BY a.event_type, a.hour""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ts_resample" -> resampleQ,
    "q_ts_ewma" -> ewmaQ)

  def oracle: Map[String, String] = Map(
    "q_ts_resample" -> resampleSql,
    "q_ts_ewma" -> ewmaSql)
}
