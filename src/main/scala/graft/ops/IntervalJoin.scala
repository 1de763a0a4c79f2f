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

  /** The 13 Allen relations as one CASE over exact microsecond bounds —
    * equality tests first (meets/starts/finishes/equal are measure-zero
    * on continuous time but exact on integer timestamps), then the
    * strict-order relations. Shared text with the oracle. */
  private val allenCase: String =
    """CASE
      |  WHEN alo = blo AND ahi = bhi THEN 'equal'
      |  WHEN ahi = blo THEN 'meets'
      |  WHEN bhi = alo THEN 'met_by'
      |  WHEN alo = blo AND ahi < bhi THEN 'starts'
      |  WHEN alo = blo AND ahi > bhi THEN 'started_by'
      |  WHEN ahi = bhi AND alo > blo THEN 'finishes'
      |  WHEN ahi = bhi AND alo < blo THEN 'finished_by'
      |  WHEN ahi < blo THEN 'before'
      |  WHEN bhi < alo THEN 'after'
      |  WHEN alo > blo AND ahi < bhi THEN 'during'
      |  WHEN alo < blo AND ahi > bhi THEN 'contains'
      |  WHEN alo < blo AND ahi > blo AND ahi < bhi THEN 'overlaps'
      |  ELSE 'overlapped_by'
      |END""".stripMargin

  /** q_join_allen entry: ALLEN INTERVAL-RELATION census (Allen, CACM
    * 1983 — the 13 mutually-exclusive, jointly-exhaustive relations
    * between two intervals; the vocabulary of temporal reasoning and
    * of every temporal-join optimizer): per user, the activity
    * interval [first, last event] of each event type; for every type
    * pair, classify the pair's relation and census the counts per
    * (type_a, type_b, relation). "Does error activity sit INSIDE view
    * activity or straddle it" is a temporal-containment question a
    * plain overlap join can't distinguish — Allen's algebra can.
    *
    * Scale shape: ONE combinable groupBy to the (user × type) interval
    * frame (≤ users × types rows), a per-user self-join (≤ C(types,2)
    * pairs per user — bounded fan-out, no corpus self-join), and a
    * census groupBy over ≤ types² × 13 cells. Classification is exact
    * integer-microsecond comparisons — no FP anywhere. */
  def allenQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val iv = graft.Tables.t(s, dir, "events")
      .groupBy($"user_id", $"event_type")
      .agg(min(unix_micros($"ts")).as("lo"),
        max(unix_micros($"ts")).as("hi"),
        count(lit(1)).as("n"))
      .filter($"n" >= 2)
    val pairs = iv.as("a").join(iv.as("b"),
        $"a.user_id" === $"b.user_id" &&
          $"a.event_type" < $"b.event_type")
      .select($"a.event_type".as("type_a"), $"b.event_type".as("type_b"),
        $"a.lo".as("alo"), $"a.hi".as("ahi"),
        $"b.lo".as("blo"), $"b.hi".as("bhi"))
    pairs
      .withColumn("relation", expr(allenCase))
      .groupBy($"type_a", $"type_b", $"relation")
      .agg(count(lit(1)).as("n_pairs"))
      .select($"type_a", $"type_b", $"relation",
        $"n_pairs".cast("long").as("n_pairs"))
      .orderBy($"type_a", $"type_b", $"relation")
  }

  val allenSql: String =
    s"""WITH iv AS (
      |  SELECT user_id, event_type,
      |    MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi,
      |    COUNT(*) AS n
      |  FROM events GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |pairs AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    a.lo AS alo, a.hi AS ahi, b.lo AS blo, b.hi AS bhi
      |  FROM iv a JOIN iv b
      |    ON a.user_id = b.user_id AND a.event_type < b.event_type)
      |SELECT type_a, type_b,
      |  ${allenCase.replace("\n", "\n      |  ")} AS relation,
      |  CAST(COUNT(*) AS BIGINT) AS n_pairs
      |FROM pairs
      |GROUP BY 1, 2, 3
      |ORDER BY type_a, type_b, relation""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_interval" -> priceBandQ,
    "q_join_allen" -> allenQ)

  def oracle: Map[String, String] = Map(
    "q_join_interval" -> priceBandSql,
    "q_join_allen" -> allenSql)
}
