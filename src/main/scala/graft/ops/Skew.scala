package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Skew mitigation: salted two-stage aggregation. A single hot key
  * turns `groupBy(key)` into one straggler task; salting splits each
  * key across `salt` partial groups (stage 1 shuffles on (key, salt) —
  * hot key now spread over `salt` tasks) and re-aggregates the partials
  * (stage 2 shuffles `salt` rows per key). Correct for any algebraic
  * aggregate expressed as (partial, merge) — here counts and decimal
  * sums, the exact-by-construction pair used across the query suite.
  *
  * AQE's skew-join handling covers JOIN skew automatically; aggregation
  * skew under a hot group key is the case that still needs this shape.
  */
object Skew {

  /** groupBy(key).agg(count(*), sum(valueCol)) with `salt`-way salting.
    * Output columns: key, n, total (decimal sum cast to double). */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
                     salt: Int = 16): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(salt)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("pn"),
        sum(col(valueCol).cast("decimal(18,2)")).as("ps"))
    partial
      .groupBy(col(key))
      .agg(sum(col("pn")).as("n"),
        sum(col("ps")).cast("double").as("total"))
  }

  /** Reference implementation (single-stage) for equivalence checks. */
  def directCountSum(df: DataFrame, key: String, valueCol: String): DataFrame =
    df.groupBy(col(key))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("total"))

  /** q_skew_report entry: the key-distribution diagnosis you run BEFORE
    * choosing a mitigation — per-key counts for orders-per-customer,
    * summarized as cardinality, max/mean, R-7 p50/p90/p99, and the
    * hottest key's share of all rows. A skew factor (max/mean) near 1
    * says hash-partitioning is safe; a large one tells you which side
    * needs salting, AQE skew splitting, or a broadcast.
    *
    * Scale shape: the corpus collapses to the per-key count table first
    * (combinable groupBy, |keys| rows); the quantile pass runs the
    * binsQ window-interpolation shape over ONE partition of that
    * (already-reduced) table — swap `approx_percentile` when |keys|
    * itself is huge. All stats from exact integers; rounds per the
    * shared FP contract. */
  def skewReportQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val counts = graft.Tables.t(s, dir, "orders")
      .groupBy($"o_custkey").agg(count(lit(1)).as("n"))
      .select($"n".cast("double").as("v"))
    def interp(p: Double): Column = {
      val idx = lit(p) * ($"cnt" - lit(1)).cast("double")
      val d = abs(idx - ($"rn" - lit(1)).cast("double"))
      round(sum(when(d < 1, $"v" * (lit(1d) - d)).otherwise(lit(0d))), 4)
    }
    // the per-key count frame is |keys|-sized (data-scaled): rank it
    // through the distributed Rank pass, not a single-partition window
    // (equal v values are interchangeable for the interpolation, so
    // the within-tie order is irrelevant to the result)
    Rank.orderedPrefix(counts, order = Seq($"v"),
        rnOut = Some("rn"), countOut = Some("cnt"))
      .groupBy()
      .agg(
        count(lit(1)).cast("long").as("n_keys"),
        sum($"v").cast("long").as("total_rows"),
        max($"v").cast("long").as("max_n"),
        round(sum($"v") / count(lit(1)), 6).as("mean_n"),
        interp(0.5).as("p50"), interp(0.9).as("p90"), interp(0.99).as("p99"))
      .withColumn("skew_factor",
        round($"max_n" / $"mean_n", 6))
      .withColumn("top_share",
        round($"max_n".cast("double") / $"total_rows", 6))
  }

  val skewReportSql: String =
    """WITH counts AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS v
      |  FROM orders GROUP BY o_custkey)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
      |  CAST(SUM(v) AS BIGINT) AS total_rows,
      |  CAST(MAX(v) AS BIGINT) AS max_n,
      |  ROUND(SUM(v) / COUNT(*), 6) AS mean_n,
      |  ROUND(quantile_cont(v, 0.5), 4) AS p50,
      |  ROUND(quantile_cont(v, 0.9), 4) AS p90,
      |  ROUND(quantile_cont(v, 0.99), 4) AS p99,
      |  ROUND(CAST(MAX(v) AS BIGINT) / ROUND(SUM(v) / COUNT(*), 6), 6)
      |    AS skew_factor,
      |  ROUND(CAST(CAST(MAX(v) AS BIGINT) AS DOUBLE)
      |    / CAST(SUM(v) AS BIGINT), 6) AS top_share
      |FROM counts""".stripMargin

  // --- registry -------------------------------------------------------------

  /** q_agg_salted: the salted two-stage aggregate, driver-checked
    * against the plain GROUP BY oracle — the decomposition must be
    * EXACT (decimal partials), not just statistically close. */
  /** q_join_salted entry: SKEW-SAFE SALTED JOIN — the JOIN-side
    * counterpart of [[saltedCountSum]] for when AQE's runtime skew
    * split is unavailable (stream-static joins, non-AQE engines, or a
    * key so hot one task still OOMs): construct a hot key in-query
    * (~70% of lineitems collapse onto class 0), then join the fact to
    * a 64-row dim by REPLICATING the dim 16× with a salt column while
    * each fact row picks one deterministic salt — the hot key's rows
    * spread over 16 (key, salt) partitions instead of one straggler.
    * Join RESULTS are identical to the unsalted join by construction;
    * the oracle computes the plain join, so the driver gate proves the
    * salted plan's semantics, and the spec asserts the hot key's salt
    * partitions are balanced.
    *
    * Scale shape: fact side = pure map (key-class + salt columns);
    * dim×16 is still tiny and broadcast-eligible — at true scale the
    * dim may be too big to broadcast, and this (key, salt) shuffle
    * join is exactly the shape that survives; rollup is a combinable
    * groupBy. Determinism: classes/salts are integer hash arithmetic;
    * money sums exact DECIMAL. */
  def saltedJoinQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val salt = 16
    val fact = t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_quantity",
        when($"l_orderkey" % 10 < 7, 0L)
          .otherwise($"l_orderkey" % 64).as("k"),
        (Hashing.md5Long60(concat(lit("salt:"),
          $"l_orderkey".cast("string"), lit(":"),
          $"l_linenumber".cast("string"))) % salt).as("salt"))
    val dim = s.range(0, 64).select($"id".as("k"),
      ($"id" * 7 + 3).as("weight"))
    val dimSalted = dim.crossJoin(
      s.range(0, salt).select($"id".as("salt")))
    val joined = fact.join(dimSalted, Seq("k", "salt"))
    joined.groupBy($"k")
      .agg(count(lit(1)).as("n_rows"),
        sum($"l_quantity".cast("decimal(18,2)")).as("qty"),
        max($"weight").as("weight"))
      .select($"k".cast("long").as("k"),
        $"n_rows".cast("long").as("n_rows"),
        $"qty".cast("double").as("total_qty"),
        $"weight".cast("long").as("weight"))
      .orderBy($"k")
  }

  val saltedJoinSql: String =
    """WITH fact AS (
      |  SELECT l_quantity,
      |    CASE WHEN l_orderkey % 10 < 7 THEN 0
      |      ELSE l_orderkey % 64 END AS k
      |  FROM lineitem),
      |dim AS (SELECT j AS k, j * 7 + 3 AS weight FROM range(0, 64) t(j))
      |SELECT CAST(f.k AS BIGINT) AS k,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
      |  CAST(MAX(weight) AS BIGINT) AS weight
      |FROM fact f JOIN dim d ON f.k = d.k
      |GROUP BY f.k ORDER BY k""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_salted" -> saltedJoinQ,
    "q_agg_salted" -> ((s, dir) =>
      saltedCountSum(graft.Tables.t(s, dir, "lineitem"),
        "l_returnflag", "l_extendedprice")
        .orderBy(col("l_returnflag"))),
    "q_skew_report" -> skewReportQ)

  def oracle: Map[String, String] = Map(
    "q_join_salted" -> saltedJoinSql,
    "q_agg_salted" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_skew_report" -> skewReportSql)
}
