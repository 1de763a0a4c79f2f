package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** 2-D skyline (Pareto frontier) over `part`: the points no other part
  * dominates under (minimize p_retailprice, maximize p_size) — the
  * classic OLAP preference query (Börzsönyi et al., ICDE 2001), and in
  * a data pipeline the "best tradeoff" selector (cost vs capability,
  * doc length vs quality, ...).
  *
  * The reference's SQL engine would express this as a NOT EXISTS
  * dominance anti-join — O(n²). The 2-D case collapses to a prefix
  * maximum: after reducing to one row per distinct price (keep the max
  * size — anything else at that price is dominated), a point is on the
  * frontier iff its size strictly exceeds every size at a cheaper
  * price.
  *
  * Scale shape — this is the distributed two-pass prefix-max, not a
  * single-task global window:
  *   1. groupBy(price) → (price, best_size): shuffle on price with
  *      map-side combine; output ≤ #distinct prices.
  *   2. `repartitionByRange(price)` + sort within partitions, then a
  *      per-partition linear scan keeps local frontier candidates
  *      (running max — the one genuinely imperative step, a narrow
  *      `mapPartitions`).
  *   3. The cross-partition correction needs only each partition's MAX
  *      — #partitions rows, never data-sized — windowed into a prefix
  *      max and broadcast back; survivors beat the prefix or drop.
  * A `Window.orderBy(price)` with no partitionBy would instead ship
  * every distinct price into ONE task — [[windowRef]] keeps that shape
  * as the spec's equivalence anchor, and the oracle uses the same
  * single-window form (fine in DuckDB at test scale).
  *
  * Determinism: the frontier is a set property of the data — partition
  * boundaries (RangePartitioner sampling) cannot change the result,
  * only which pass eliminates a dominated row. No arithmetic beyond
  * comparisons, so there is no FP contract to pin.
  */
object Skyline {

  /** (price, best_size) per distinct price — stage 1. */
  private def bestPerPrice(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "part")
      .groupBy($"p_retailprice".as("price"))
      .agg(max($"p_size").as("best_size"))
  }

  /** q_skyline entry: distributed two-pass frontier. */
  def skylineQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val local = bestPerPrice(s, dir)
      .repartitionByRange(32, $"price")
      .sortWithinPartitions($"price")
      .withColumn("pid", spark_partition_id())
      .as[(Double, Int, Int)]
      .mapPartitions { it =>
        // local frontier: strictly-increasing best_size in price order
        var run = Int.MinValue
        it.flatMap { case (price, best, pid) =>
          if (best > run) { run = best; Iterator((price, best, pid)) }
          else Iterator.empty
        }
      }
      .toDF("price", "best_size", "pid")
    // per-partition maxima (the local frontier's last element) → prefix
    // max over PRECEDING partitions; #partitions rows, so the
    // single-task window is bounded by the partition count, not data
    val prefix = local.groupBy($"pid").agg(max($"best_size").as("pmax"))
      .withColumn("prev_max",
        max($"pmax").over(Window.orderBy($"pid")
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select($"pid", $"prev_max")
    local.join(broadcast(prefix), "pid")
      .filter($"prev_max".isNull || $"best_size" > $"prev_max")
      .select($"price", $"best_size")
      .orderBy($"price")
  }

  /** Single-window reference plan (spec equivalence anchor; not
    * registered — its no-partition window is the single-task shape the
    * two-pass form exists to avoid). */
  private[ops] def windowRef(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.orderBy($"price").rowsBetween(Window.unboundedPreceding, -1)
    bestPerPrice(s, dir)
      .withColumn("prev_best", max($"best_size").over(w))
      .filter($"prev_best".isNull || $"best_size" > $"prev_best")
      .select($"price", $"best_size")
      .orderBy($"price")
  }

  /** DuckDB twin: the same prefix-max formulation in one window. */
  val skylineSql: String =
    """WITH b AS (
      |  SELECT p_retailprice AS price, MAX(p_size) AS best_size
      |  FROM part GROUP BY 1),
      |w AS (
      |  SELECT price, best_size,
      |    MAX(best_size) OVER (ORDER BY price
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_best
      |  FROM b)
      |SELECT price, best_size FROM w
      |WHERE prev_best IS NULL OR best_size > prev_best
      |ORDER BY price""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_skyline" -> skylineQ)

  def oracle: Map[String, String] = Map(
    "q_skyline" -> skylineSql)
}
