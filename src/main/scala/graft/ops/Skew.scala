package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  // --- registry -------------------------------------------------------------

  /** q_agg_salted: the salted two-stage aggregate, driver-checked
    * against the plain GROUP BY oracle — the decomposition must be
    * EXACT (decimal partials), not just statistically close. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_salted" -> ((s, dir) =>
      saltedCountSum(graft.Tables.t(s, dir, "lineitem"),
        "l_returnflag", "l_extendedprice")
        .orderBy(col("l_returnflag"))))

  def oracle: Map[String, String] = Map(
    "q_agg_salted" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
