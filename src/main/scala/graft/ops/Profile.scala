package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Numeric-distribution profiling — the fixed-size histogram a pipeline
  * publishes per column per ingestion batch (the input to drift checks
  * like [[Drift]] and to human data-quality review).
  *
  * Shape: one bounded min/max aggregate (broadcast back as a 1-row
  * dimension — the [[Drift]] totals pattern, no driver collect), then a
  * map-side-combinable groupBy over ≤ `bins` keys. Two scans of the
  * column at any scale, both at scan speed; the histogram itself is
  * O(bins) rows however large the input. Bin ids come from the same
  * explicit floor((v − lo) · bins / span) formula evaluated identically
  * on both engines (clamped so v = hi lands in the last bin); per-bin
  * min/max are exact values (no FP arithmetic), so the result is
  * hash-stable.
  */
object Profile {

  /** Histogram of `v` into `bins` uniform buckets over its observed
    * [min, max]; emits bin id, count, and exact per-bin extrema. */
  def histogram(df: DataFrame, v: Column, bins: Int): DataFrame = {
    val ext = df.agg(min(v).cast("double").as("graft_lo"),
      max(v).cast("double").as("graft_hi"))
    val span = col("graft_hi") - col("graft_lo")
    val bin = least(lit(bins - 1L), greatest(lit(0L),
      floor((v.cast("double") - col("graft_lo")) * bins / span).cast("long")))
    df.crossJoin(broadcast(ext))
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        min(v).as("v_min"), max(v).as("v_max"))
  }

  def histogramQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    histogram(t(s, dir, "events"), $"value", bins = 20)
      .orderBy($"bin")
  }

  val histogramSql: String =
    """WITH ext AS (
      |  SELECT CAST(min(value) AS DOUBLE) AS lo,
      |         CAST(max(value) AS DOUBLE) AS hi FROM events)
      |SELECT
      |  least(19, greatest(0, CAST(floor((value - lo) * 20 / (hi - lo)) AS BIGINT))) AS bin,
      |  CAST(count(*) AS BIGINT) AS n,
      |  min(value) AS v_min, max(value) AS v_max
      |FROM events, ext GROUP BY 1 ORDER BY bin""".stripMargin

  /** Per-group z-score outlier accounting — the numeric-column anomaly
    * check (|v − μ| > 3σ) a pipeline runs per ingestion batch.
    *
    * Determinism: double sums drift with partition order, so μ and σ
    * derive from EXACT decimal Σv and Σv² (map-side-combinable, integer
    * arithmetic under the hood); the double math that follows is the
    * same expression tree on both engines. Two scan-speed aggregations
    * (moments, then the flag count against the broadcast per-group
    * stats row), never a per-group sort. */
  def zscoreQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
    val moments = ev.groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,6)")).as("s1"),
        // 18,6 × 18,6 → 36/37,12 stays inside both engines' 38-digit cap
        sum($"value".cast("decimal(18,6)") * $"value".cast("decimal(18,6)"))
          .as("s2"))
      .select($"event_type", $"n",
        ($"s1".cast("double") / $"n").as("mu"),
        sqrt(($"s2".cast("double") - $"s1".cast("double") *
          $"s1".cast("double") / $"n") / ($"n" - 1)).as("sigma"))
    ev.join(broadcast(moments), "event_type")
      .groupBy($"event_type")
      .agg(max($"n").as("n"),
        round(max($"mu"), 6).as("mu"),
        round(max($"sigma"), 6).as("sigma"),
        sum(when(abs($"value" - $"mu") > $"sigma" * 3, 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy($"event_type")
  }

  val zscoreSql: String =
    """WITH m AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1d,
      |    CAST(sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s2d
      |  FROM events GROUP BY event_type),
      |st AS (
      |  SELECT event_type, n, s1d / n AS mu,
      |         sqrt((s2d - s1d * s1d / n) / (n - 1)) AS sigma FROM m)
      |SELECT e.event_type, max(st.n) AS n,
      |  round(max(st.mu), 6) AS mu, round(max(st.sigma), 6) AS sigma,
      |  CAST(sum(CASE WHEN abs(e.value - st.mu) > st.sigma * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM events e JOIN st USING (event_type)
      |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin

  /** Order-independent content checksum — the integrity primitive for
    * validating a copied/migrated/re-partitioned table WITHOUT sorting
    * it: per-row 60-bit md5 of a canonical string encoding, summed as
    * DECIMAL(38,0) (exact, overflow-free, commutative — so any
    * partitioning, engine, or row order yields the identical digest).
    * A single flipped value anywhere changes the sum with probability
    * 1 − 2⁻⁶⁰. One map + one scalar aggregate: scan speed, 1-row
    * output, no exchange beyond the final combine.
    *
    * Canonical encoding pins column order and formatting explicitly
    * (`concat_ws('|', ...)` over string-cast columns) — checksums are a
    * CONTRACT, so the encoding lives in the query, not in engine
    * defaults. Floating-point columns are pinned through a fixed-scale
    * DECIMAL before stringification: a raw double→string cast leaves
    * the digest hostage to two engines' double-formatting agreeing
    * forever, which is exactly the dependence a canonical encoding
    * exists to remove. DECIMAL(12,2)→string is fixed-format ("17.00")
    * in both engines. */
  def checksumQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val canon = concat_ws("|",
      $"l_orderkey".cast("string"), $"l_linenumber".cast("string"),
      $"l_quantity".cast("decimal(12,2)").cast("string"), $"l_returnflag")
    t(s, dir, "lineitem")
      .select(Hashing.md5Long60(canon).as("h"))
      .agg(count(lit(1)).as("n_rows"),
        sum($"h".cast("decimal(38,0)")).as("checksum"))
      .select($"n_rows", $"checksum".cast("decimal(38,0)").as("checksum"))
  }

  val checksumSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(CAST(('0x' || substr(md5(
      |    CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)
      |    || '|' || CAST(CAST(l_quantity AS DECIMAL(12,2)) AS VARCHAR) || '|' || l_returnflag
      |  ), 1, 15))::UBIGINT AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS checksum
      |FROM lineitem""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_profile_histogram" -> histogramQ,
    "q_profile_zscore" -> zscoreQ,
    "q_profile_checksum" -> checksumQ)

  def oracle: Map[String, String] = Map(
    "q_profile_histogram" -> histogramSql,
    "q_profile_zscore" -> zscoreSql,
    "q_profile_checksum" -> checksumSql)
}
