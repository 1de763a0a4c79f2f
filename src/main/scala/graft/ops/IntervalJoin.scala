package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Interval (range-predicate) join between two LARGE tables without a
  * nested-loop plan.
  *
  * `probe.value BETWEEN ranges.lo AND ranges.hi` has no equi-key, so
  * Catalyst's only direct plans are BroadcastNestedLoopJoin (needs one
  * side small) or a cartesian — both scale-killers when both sides are
  * big. The standard fix is BUCKETING the domain: every range row is
  * exploded to the fixed-width buckets it overlaps, every probe hashes
  * to exactly one bucket, and the range predicate rides a bucket
  * EQUI-join (shuffle-hash/sort-merge — scales out) with the exact
  * BETWEEN re-checked as a residual filter. Each probe appears once per
  * overlapping range bucket, and a range covers a probe's single bucket
  * at most once — so no post-join dedup is needed.
  *
  * Cost model: candidate volume = Σ_probe (ranges overlapping its
  * bucket) ≈ probes × density × (width + avg range length); the bucket
  * `width` knob trades explode factor (ranges side, ⌈len/width⌉ + 1
  * rows per range) against candidate false positives (probe side).
  * Everything shuffles by bucket — co-partitioned, combiner-friendly,
  * AQE-splittable if a bucket is hot. This is the as-of-join trick
  * ([[AsOf]]) generalized from "latest before" to arbitrary intervals.
  */
object IntervalJoin {

  /** Join `probe` rows to every `ranges` row with lo ≤ p ≤ hi via a
    * bucket equi-join. `width` is the bucket size in the value's units. */
  def bucketed(probe: DataFrame, p: Column, ranges: DataFrame,
               lo: Column, hi: Column, width: Double): DataFrame = {
    val rb = ranges.withColumn("graft_bucket",
      explode(sequence(floor(lo / width).cast("long"),
                       floor(hi / width).cast("long"))))
    val pb = probe.withColumn("graft_bucket",
      floor(p / width).cast("long"))
    pb.join(rb, "graft_bucket")
      .filter(p.between(lo, hi))
      .drop("graft_bucket")
  }

  /** Price-band lookup: lineitem unit price vs ±0.05 bands around each
    * part's list price — both sides scale with SF, so the naive plan is
    * a 600k × 20k nested loop at sf0.1 and the bucket join is the only
    * shape that survives 100×. Counts only (exact ints, hash-stable). */
  def priceBandQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val probe = t(s, dir, "lineitem")
      .select($"l_orderkey", ($"l_extendedprice" / $"l_quantity").as("up"))
    val ranges = t(s, dir, "part")
      .select($"p_partkey", $"p_brand",
        ($"p_retailprice" - 0.05).as("lo"),
        ($"p_retailprice" + 0.05).as("hi"))
    bucketed(probe, $"up", ranges, $"lo", $"hi", width = 0.25)
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct($"p_partkey").as("n_parts"),
        countDistinct($"l_orderkey").as("n_orders"))
      .orderBy($"p_brand")
  }

  val priceBandSql: String =
    """WITH probe AS (
      |  SELECT l_orderkey, l_extendedprice / l_quantity AS up FROM lineitem),
      |r AS (
      |  SELECT p_partkey, p_brand,
      |         p_retailprice - 0.05 AS lo, p_retailprice + 0.05 AS hi
      |  FROM part)
      |SELECT p_brand,
      |  CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(count(DISTINCT p_partkey) AS BIGINT) AS n_parts,
      |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
      |FROM probe JOIN r ON up BETWEEN lo AND hi
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_interval" -> priceBandQ)

  def oracle: Map[String, String] = Map(
    "q_join_interval" -> priceBandSql)
}
