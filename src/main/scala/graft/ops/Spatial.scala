package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Grid-bucketed spatial join — the "points within distance d" self-join
  * every geo/embedding-2D workload needs, in the shape that survives
  * 100 TB: bucket points into d×d grid cells, join each point's 3×3
  * cell neighborhood against cell residents, verify exact distance
  * inside the bucket. Candidates scale with local density × 9 cells —
  * never all-pairs — and the shuffle key is the cell id.
  *
  * The fixture has no coordinates, so each customer gets a
  * deterministic md5-derived position on a 90×90 unit plane,
  * IDENTICALLY derivable in the DuckDB oracle (the suite's one
  * cross-engine hash contract, [[Hashing]]). All arithmetic is integer
  * HUNDREDTHS of a unit (coordinates 0..8999, cell = hundredths div
  * 100, squared distance in hundredths² ≤ 1.6e8), so the operator is
  * exact end-to-end: within-1.0-unit ⇔ dist2 ≤ 100².
  *
  * Dedup-by-construction: only the EXPLODED side's smaller id may
  * match the resident side, so each qualifying unordered pair is
  * emitted exactly once — no DISTINCT pass over candidates.
  */
object Spatial {

  private val Cells = 90 // 90x90 unit grid; coordinates in [0, 90)
  private val RadiusH = 100L // 1.00 unit, in hundredths

  /** (id, xi, yi, cx, cy) — integer-hundredth positions + home cell. */
  private def points(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .select($"c_custkey".as("id"))
      .withColumn("xi",
        Hashing.md5Long60(concat($"id".cast("string"), lit(":x")))
          % (Cells * 100))
      .withColumn("yi",
        Hashing.md5Long60(concat($"id".cast("string"), lit(":y")))
          % (Cells * 100))
      .withColumn("cx", expr("xi div 100"))
      .withColumn("cy", expr("yi div 100"))
  }

  /** q_join_spatial entry: all customer pairs within 1.0 unit. */
  def spatialQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pts = points(s, dir)
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
    val probes = pts
      .select($"id".as("id_a"), $"xi".as("xa"), $"yi".as("ya"),
        explode(array(offsets: _*)).as("o"),
        $"cx", $"cy")
      .select($"id_a", $"xa", $"ya",
        ($"cx" + $"o.dx").as("kx"), ($"cy" + $"o.dy").as("ky"))
    probes
      .join(pts.select($"id".as("id_b"), $"xi".as("xb"), $"yi".as("yb"),
          $"cx".as("kx"), $"cy".as("ky")),
        Seq("kx", "ky"))
      .filter($"id_a" < $"id_b")
      .withColumn("dist2_h2",
        ($"xa" - $"xb") * ($"xa" - $"xb") + ($"ya" - $"yb") * ($"ya" - $"yb"))
      .filter($"dist2_h2" <= RadiusH * RadiusH)
      .select($"id_a", $"id_b", $"dist2_h2")
      .orderBy($"id_a", $"id_b")
  }

  val spatialSql: String =
    s"""WITH pts AS (
      |  SELECT c_custkey AS id,
      |    ('0x' || substr(md5(c_custkey::VARCHAR || ':x'), 1, 15))
      |      ::UBIGINT::BIGINT % ${Cells * 100} AS xi,
      |    ('0x' || substr(md5(c_custkey::VARCHAR || ':y'), 1, 15))
      |      ::UBIGINT::BIGINT % ${Cells * 100} AS yi
      |  FROM customer),
      |cells AS (SELECT id, xi, yi, xi // 100 AS cx, yi // 100 AS cy
      |          FROM pts),
      |probes AS (
      |  SELECT id AS id_a, xi AS xa, yi AS ya,
      |    cx + o.dx AS kx, cy + o.dy AS ky
      |  FROM cells CROSS JOIN (
      |    SELECT dx.x AS dx, dy.x AS dy
      |    FROM (SELECT unnest([-1, 0, 1]) AS x) dx,
      |         (SELECT unnest([-1, 0, 1]) AS x) dy) o)
      |SELECT p.id_a, c.id AS id_b,
      |  (p.xa - c.xi) * (p.xa - c.xi) + (p.ya - c.yi) * (p.ya - c.yi)
      |    AS dist2_h2
      |FROM probes p JOIN cells c ON p.kx = c.cx AND p.ky = c.cy
      |  AND p.id_a < c.id
      |WHERE (p.xa - c.xi) * (p.xa - c.xi) + (p.ya - c.yi) * (p.ya - c.yi)
      |  <= ${RadiusH * RadiusH}
      |ORDER BY id_a, id_b""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_spatial" -> spatialQ)

  def oracle: Map[String, String] = Map(
    "q_join_spatial" -> spatialSql)
}
