package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
}
