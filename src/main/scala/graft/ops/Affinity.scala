package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Market-basket pair affinity over orders: which part brands co-occur
  * in the same order, counted once per order — the co-occurrence
  * primitive behind recommendation candidates, bundle detection, and
  * (on text corpora) co-citation / co-mention analysis.
  *
  * Scale shape — the item-pair blowup is contained BEFORE the self-join:
  * the basket table collapses to DISTINCT (order, brand) first, so the
  * self-join's per-order fan-out is (distinct brands per order)² —
  * bounded by basket width (TPC-H: ≤ 7 lines/order), never corpus size,
  * and the join is an equi-join on the order key (shuffle co-located,
  * AQE-splittable). The part dimension joins by key before the
  * projection to brand, so only (orderkey, 25-value brand) rows travel
  * into the pair stage. Counts are map-side-combinable with ≤ |brands|²
  * groups. All-integer arithmetic — no FP contract needed.
  */
object Affinity {

  /** q_affinity_pairs entry: top brand pairs by order co-occurrence. */
  def pairsQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val baskets = t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_partkey")
      .join(t(s, dir, "part").select($"p_partkey", $"p_brand"),
        $"l_partkey" === $"p_partkey")
      .select($"l_orderkey".as("ok"), $"p_brand".as("b"))
      .distinct()
    baskets.as("x").join(baskets.as("y"),
        $"x.ok" === $"y.ok" && $"x.b" < $"y.b")
      .groupBy($"x.b".as("brand_a"), $"y.b".as("brand_b"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy($"n_orders".desc, $"brand_a", $"brand_b")
      .limit(50)
  }

  val pairsSql: String =
    """WITH baskets AS (
      |  SELECT DISTINCT l_orderkey AS ok, p_brand AS b
      |  FROM lineitem JOIN part ON l_partkey = p_partkey)
      |SELECT x.b AS brand_a, y.b AS brand_b,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders
      |FROM baskets x JOIN baskets y ON x.ok = y.ok AND x.b < y.b
      |GROUP BY 1, 2
      |ORDER BY n_orders DESC, brand_a, brand_b
      |LIMIT 50""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_affinity_pairs" -> pairsQ)

  def oracle: Map[String, String] = Map(
    "q_affinity_pairs" -> pairsSql)
}
