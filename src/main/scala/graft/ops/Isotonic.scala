package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ISOTONIC REGRESSION calibration by pool-adjacent-violators — the
  * standard non-parametric way to turn a classifier score into a
  * calibrated probability (Zadrozny & Elkan, KDD 2002; sklearn's
  * `isotonic` mode): fit the best monotone-nondecreasing step function
  * from score to P(label=1) in least squares. Unlike the fixed-bin
  * reliability table ([[Classify.calibrationQ]]), the isotonic fit
  * chooses its own step boundaries and is the calibrator actually
  * shipped in front of thresholded filters.
  *
  * Architecture is the bounded-solve pattern ([[Graph.mstQ]],
  * [[Preference.btQ]]): the corpus collapses to a VALUE-BOUNDED
  * (2-dp score, Σy, n) grid in one combinable exchange, and PAV runs
  * in one task over that grid with EXACT RATIONAL block averages
  * (cross-multiplied long comparisons — no FP in the merge decisions).
  *
  * Correctness cross-check: PAV's answer is UNIQUE (strictly convex
  * least squares under the monotonicity cone), and the oracle computes
  * it with a COMPLETELY DIFFERENT algorithm — the minimax formula
  * fit_i = max_{j ≤ i} min_{k ≥ i} avg(y[j..k]) over prefix sums
  * (Robertson–Wright–Dykstra 1988, Thm 1.4.4) — so the two engines
  * agree only if both algorithms solve the same program exactly. Same
  * proof shape as [[Graph.mstQ]]'s Kruskal-vs-KSV check. */
object Isotonic {

  /** q_eval_isotonic entry: per 2-dp score-grid point — n, positives,
    * raw rate, and the isotonic calibrated probability. */
  def isotonicQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grid = Classify.scored(s, dir)
      .groupBy(round($"score", 2).as("v"))
      .agg(sum($"y").as("n1"), count(lit(1)).as("n"))
    val fitted = grid.select($"v", $"n1", $"n").as[(Double, Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val rows = it.toArray.sortBy(_._1)
        // PAV over (sumY, n) blocks; violation test is exact rational:
        // a/b > c/d  <=>  a*d > c*b  (all positive denominators)
        final case class Block(var sumY: Long, var n: Long, val members:
          scala.collection.mutable.ArrayBuffer[(Double, Long, Long)])
        val stack = scala.collection.mutable.ArrayBuffer.empty[Block]
        rows.foreach { r =>
          stack += Block(r._2, r._3,
            scala.collection.mutable.ArrayBuffer(r))
          while (stack.length >= 2 && {
            val a = stack(stack.length - 2); val b = stack.last
            a.sumY * b.n > b.sumY * a.n // prev avg > curr avg: violation
          }) {
            val b = stack.remove(stack.length - 1)
            val a = stack.last
            a.sumY += b.sumY; a.n += b.n; a.members ++= b.members
          }
        }
        stack.iterator.flatMap { blk =>
          blk.members.iterator.map { case (v, n1, n) =>
            (v, n, n1, blk.sumY, blk.n)
          }
        }
      }
      .toDF("v", "n", "n1", "block_sum", "block_n")
    fitted.select($"v", $"n", $"n1",
        round($"n1".cast("double") / $"n", 6).as("raw_rate"),
        round($"block_sum".cast("double") / $"block_n", 6).as("iso_prob"))
      .orderBy($"v")
  }

  /** Oracle: the minimax characterization over prefix sums — for each
    * grid index i, max over starts j ≤ i of (min over ends k ≥ i of
    * the [j, k] average). O(n³) pairs on a 2-dp-bounded grid. */
  val isotonicSql: String =
    s"""WITH ${Classify.scoredSql},
       |g AS MATERIALIZED (
       |  SELECT ROUND(score, 2) AS v, CAST(SUM(y) AS BIGINT) AS n1,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM scored GROUP BY 1),
       |r AS MATERIALIZED (
       |  SELECT v, n1, n, ROW_NUMBER() OVER (ORDER BY v) AS i,
       |    SUM(n1) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cy,
       |    SUM(n) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn
       |  FROM g),
       |seg AS MATERIALIZED (
       |  SELECT a.i AS j, b.i AS k,
       |    CAST(b.cy - a.cy + a.n1 AS DOUBLE)
       |      / (b.cn - a.cn + a.n) AS avg_jk
       |  FROM r a JOIN r b ON a.i <= b.i),
       |mn AS MATERIALIZED (
       |  SELECT r.i, seg.j, MIN(avg_jk) AS m
       |  FROM r JOIN seg ON seg.j <= r.i AND seg.k >= r.i
       |  GROUP BY r.i, seg.j),
       |fit AS (SELECT i, MAX(m) AS iso FROM mn GROUP BY i)
       |SELECT r.v, r.n, r.n1,
       |  ROUND(CAST(r.n1 AS DOUBLE) / r.n, 6) AS raw_rate,
       |  ROUND(iso, 6) AS iso_prob
       |FROM r JOIN fit USING (i) ORDER BY r.v""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_eval_isotonic" -> isotonicQ)

  def oracle: Map[String, String] = Map(
    "q_eval_isotonic" -> isotonicSql)
}
