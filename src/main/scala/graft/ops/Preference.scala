package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Bradley–Terry preference-strength fitting — the model behind
  * pairwise-comparison data everywhere a training pipeline ranks
  * things people (or models) compared head-to-head: RLHF preference
  * pairs, A/B interleaving results, LLM-as-judge tournaments, search
  * interleaving. Given counts n_ij of "i beat j", BT posits
  * P(i beats j) = p_i / (p_i + p_j) and the MM algorithm (Hunter,
  * Annals of Statistics 2004) iterates
  * p_i ← W_i / Σ_j m_ij / (p_i + p_j), then renormalizes — each step
  * provably increases the likelihood.
  *
  * Comparisons here are synthesized deterministically from the events
  * table: items are the event types, and each user contributes one
  * comparison per unordered type pair they used — the winner is the
  * type with the larger per-user total value (exact DECIMAL totals;
  * ties contribute nothing). That is the "which variant do users spend
  * more on, aggregated as a tournament" readout.
  *
  * Scale shape: one combinable groupBy collapses the corpus to ≤5
  * rows per user; the per-user pair fan-out is bounded by the item
  * vocabulary (≤ C(5,2) = 10 pairs/user), and the win matrix collapses
  * to ≤ items² rows before the fit. The MM loop then runs in ONE
  * bounded task over that matrix ([[Graph.mstQ]]'s filter-then-solve
  * lesson: a convergence loop over a bounded frame must not pay
  * per-round scheduler latency). Determinism is ABSOLUTE, not
  * FP-contracted: the entire fit is integer fixed-point — p in 1e-9
  * units, per-opponent terms m_ij·10¹⁸ floor-div (P_i+P_j), praw
  * W_i·10¹⁸ div Σterms, renormalized praw·10⁹ div Σpraw — so Spark
  * (BigInt) and DuckDB (HUGEINT) produce bit-identical iterates with
  * no rounding contract at all.
  */
object Preference {

  private[ops] val Iters = 20
  private val U = BigInt("1000000000000000000") // 1e18: ratio → 1e-9 units
  private val N9 = BigInt(1000000000)           // 1e9: renormalize scale

  /** q_pref_bt entry: per-item wins/losses/comparisons, fitted BT
    * strength (Σ = 1), and dense rank by strength. */
  def btQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ut = t(s, dir, "events")
      .groupBy($"user_id", $"event_type")
      .agg(sum($"value".cast("decimal(18,2)")).cast("decimal(28,2)").as("tot"))
    val cmp = ut.as("a").join(ut.as("b"),
        $"a.user_id" === $"b.user_id" && $"a.event_type" < $"b.event_type")
      .filter($"a.tot" =!= $"b.tot")
      .select(
        when($"a.tot" > $"b.tot", $"a.event_type")
          .otherwise($"b.event_type").as("w"),
        when($"a.tot" > $"b.tot", $"b.event_type")
          .otherwise($"a.event_type").as("l"))
    val m = cmp.groupBy($"w", $"l").agg(count(lit(1)).as("n"))
    // Bounded solve: the win matrix is ≤ items² rows; fit in one task.
    val fitted = m.as[(String, String, Long)].coalesce(1)
      .mapPartitions { it =>
        val rows = it.toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val items = rows.flatMap(r => Seq(r._1, r._2)).distinct.sorted
          val wins = items.map(i =>
            i -> rows.filter(_._1 == i).map(_._3).sum).toMap
          val mm = scala.collection.mutable.HashMap
            .empty[(String, String), Long].withDefaultValue(0L)
          rows.foreach { case (w, l, n) =>
            mm((w, l)) += n; mm((l, w)) += n }
          val comps = items.map(i =>
            i -> items.filter(_ != i).map(j => mm((i, j))).sum).toMap
          // integer fixed-point MM: P_i in 1e-9 units, start uniform
          var p = items.map(_ -> N9 / items.length).toMap
          for (_ <- 1 to Iters) {
            val praw = items.map { i =>
              val denom = items.filter(j => j != i && mm((i, j)) > 0)
                .map(j => BigInt(mm((i, j))) * U / (p(i) + p(j))).sum
              i -> (if (denom == 0) p(i) else BigInt(wins(i)) * U / denom)
            }.toMap
            val tot = praw.values.sum
            p = items.map(i => i -> praw(i) * N9 / tot).toMap
          }
          items.iterator.map(i => (i, wins(i), comps(i) - wins(i),
            comps(i), p(i).toLong))
        }
      }
      .toDF("event_type", "wins", "losses", "comparisons", "strength_n9")
    fitted
      .withColumn("strength",
        round($"strength_n9".cast("double") / 1e9, 9))
      .withColumn("rnk", row_number().over(
        Window.orderBy($"strength_n9".desc, $"event_type")))
      .select($"rnk".cast("long").as("rnk"), $"event_type", $"wins",
        $"losses", $"comparisons", $"strength")
      .orderBy($"rnk")
  }

  /** Oracle: identical integer fixed-point MM, unrolled [[Iters]]
    * blocks over HUGEINT — floor division on positives matches BigInt
    * truncation exactly, so every iterate is bit-identical. */
  val btSql: String = {
    val blocks = (0 until Iters).map { k =>
      s"""r$k AS MATERIALIZED (
         |  SELECT mm.i AS tpe,
         |    CAST(SUM(CAST(mm.n AS HUGEINT) * 1000000000000000000
         |      // CAST(a.p + b.p AS HUGEINT)) AS HUGEINT) AS d
         |  FROM mm JOIN p$k a ON a.tpe = mm.i JOIN p$k b ON b.tpe = mm.j
         |  GROUP BY mm.i),
         |q$k AS MATERIALIZED (
         |  SELECT r.tpe,
         |    CAST(CAST(w.w AS HUGEINT) * 1000000000000000000
         |      // r.d AS BIGINT) AS praw
         |  FROM r$k r JOIN wins w ON w.tpe = r.tpe),
         |p${k + 1} AS MATERIALIZED (
         |  SELECT tpe, CAST(CAST(praw AS HUGEINT) * 1000000000
         |    // (SELECT CAST(SUM(CAST(praw AS HUGEINT)) AS HUGEINT)
         |        FROM q$k) AS BIGINT) AS p
         |  FROM q$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH ut AS MATERIALIZED (
       |  SELECT user_id, event_type AS tpe,
       |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS tot
       |  FROM events GROUP BY 1, 2),
       |cmp AS MATERIALIZED (
       |  SELECT CASE WHEN a.tot > b.tot THEN a.tpe ELSE b.tpe END AS w,
       |         CASE WHEN a.tot > b.tot THEN b.tpe ELSE a.tpe END AS l
       |  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.tpe < b.tpe
       |  WHERE a.tot <> b.tot),
       |m AS MATERIALIZED (SELECT w, l, CAST(COUNT(*) AS BIGINT) AS n FROM cmp GROUP BY 1, 2),
       |pairs AS MATERIALIZED (
       |  SELECT w AS i, l AS j, n FROM m
       |  UNION ALL SELECT l AS i, w AS j, n FROM m),
       |mm AS MATERIALIZED (SELECT i, j, CAST(SUM(n) AS BIGINT) AS n FROM pairs GROUP BY 1, 2),
       |items AS MATERIALIZED (SELECT i AS tpe, CAST(SUM(n) AS BIGINT) AS comps
       |          FROM pairs GROUP BY 1),
       |wins AS MATERIALIZED (
       |  SELECT i.tpe, COALESCE(CAST(SUM(m.n) AS BIGINT), 0) AS w
       |  FROM items i LEFT JOIN m ON m.w = i.tpe GROUP BY i.tpe),
       |p0 AS MATERIALIZED (SELECT tpe, CAST(1000000000 // (SELECT COUNT(*) FROM items)
       |         AS BIGINT) AS p FROM items),
       |$blocks
       |SELECT
       |  CAST(ROW_NUMBER() OVER (ORDER BY p.p DESC, i.tpe) AS BIGINT) AS rnk,
       |  i.tpe AS event_type, w.w AS wins, (i.comps - w.w) AS losses,
       |  i.comps AS comparisons,
       |  ROUND(CAST(p.p AS DOUBLE) / 1e9, 9) AS strength
       |FROM items i JOIN wins w ON w.tpe = i.tpe
       |  JOIN p$Iters p ON p.tpe = i.tpe
       |ORDER BY rnk""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pref_bt" -> btQ)

  def oracle: Map[String, String] = Map(
    "q_pref_bt" -> btSql)
}
