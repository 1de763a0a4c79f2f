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
  * deterministic md5-derived position on an n-derived square plane,
  * IDENTICALLY derivable in the DuckDB oracle (the suite's one
  * cross-engine hash contract, [[Hashing]]). The plane SIZE is the
  * scale contract (r10 verdict item 3): a fixed 90×90 extent makes
  * density — and with it in-cell candidates AND true output pairs —
  * grow quadratically with the corpus (measured 8.2×/decade at sf1),
  * which models nothing real: a growing corpus covers growing
  * geography at roughly constant density. [[gridCells]] therefore
  * derives the extent from the row count so expected occupancy per
  * 1.0-unit cell is pinned at [[TargetPerCell]] (the
  * [[Similarity.adaptiveBits]] twin-contract pattern — the oracle
  * computes the same `GREATEST(90, CEIL(SQRT(n/2.0)))` from
  * `COUNT(*)`, so positions agree bit-for-bit). The 90 floor keeps
  * every corpus ≤ ~16k points — both oracle fixtures — on exactly
  * the historical plane.
  *
  * All arithmetic is integer HUNDREDTHS of a unit (cell = hundredths
  * div 100, squared distance in hundredths²), so the operator is
  * exact end-to-end: within-1.0-unit ⇔ dist2 ≤ 100². Cell size stays
  * equal to the radius — the minimum at which the 3×3 neighborhood
  * provably covers the radius ball.
  *
  * Dedup-by-construction: only the EXPLODED side's smaller id may
  * match the resident side, so each qualifying unordered pair is
  * emitted exactly once — no DISTINCT pass over candidates.
  */
object Spatial {

  private val MinCells = 90    // historical 90x90 floor (covers <=16.2k pts)
  private val RadiusH = 100L   // 1.00 unit, in hundredths

  /** Expected points per 1.0-unit grid cell the extent aims for. */
  private val TargetPerCell = 2.0

  /** Side length (in 1.0-unit cells) of the point plane: smallest
    * square with expected occupancy ≤ [[TargetPerCell]], floored at
    * [[MinCells]]. Mirrored literally in every oracle
    * (`GREATEST(90, CEIL(SQRT(COUNT(*) / 2.0)))` — sqrt/ceil/divide
    * are all correctly-rounded IEEE ops, identical in both engines). */
  private[ops] def gridCells(n: Long): Long =
    math.max(MinCells.toLong,
      math.ceil(math.sqrt(n.toDouble / TargetPerCell)).toLong)

  /** The oracle twin of [[gridCells]] + position derivation, as a
    * 1-row CTE `g(cells)` cross-joined into the point CTE. */
  private def ptsSql: String =
    s"""g AS (
      |  SELECT GREATEST($MinCells,
      |    CAST(CEIL(SQRT(COUNT(*) / $TargetPerCell)) AS BIGINT)) AS cells
      |  FROM customer),
      |pts AS (
      |  SELECT c_custkey AS id,
      |    ('0x' || substr(md5(c_custkey::VARCHAR || ':x'), 1, 15))
      |      ::UBIGINT::BIGINT % (g.cells * 100) AS xi,
      |    ('0x' || substr(md5(c_custkey::VARCHAR || ':y'), 1, 15))
      |      ::UBIGINT::BIGINT % (g.cells * 100) AS yi
      |  FROM customer CROSS JOIN g)""".stripMargin

  /** (id, xi, yi, cx, cy) — integer-hundredth positions + home cell on
    * the n-derived plane. */
  private def points(s: SparkSession, dir: String, cells: Long): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .select($"c_custkey".as("id"))
      .withColumn("xi",
        Hashing.md5Long60(concat($"id".cast("string"), lit(":x")))
          % (cells * 100))
      .withColumn("yi",
        Hashing.md5Long60(concat($"id".cast("string"), lit(":y")))
          % (cells * 100))
      .withColumn("cx", expr("xi div 100"))
      .withColumn("cy", expr("yi div 100"))
  }

  private def nCustomers(s: SparkSession, dir: String): Long =
    t(s, dir, "customer").count()

  /** q_join_spatial entry: all customer pairs within 1.0 unit. */
  def spatialQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pts = points(s, dir, gridCells(nCustomers(s, dir)))
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
    s"""WITH $ptsSql,
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

  private val MinPts = 2L

  /** q_cluster_dbscan entry: GRID-based density clustering (the cell
    * phase of GriDBSCAN / grid-DBSCAN) over the same md5-derived point
    * field as [[spatialQ]] — dense cells (≥ [[MinPts]] residents)
    * connect through their 8-neighborhood into clusters; sparse cells
    * are noise. Density clustering is the family k-means can't cover
    * (arbitrary-shape clusters, explicit noise), and the grid variant
    * is the one that scales: density is a combinable cell count, and
    * connectivity runs on the CELL graph (occupancy-pinned: ~n/2 cells
    * at most, orders of magnitude below the corpus), not on points.
    *
    * Cluster labels canonicalize to the minimum reachable cell id via
    * [[Graph.connectedComponentsStar]] (O(log n) rounds); isolated
    * dense cells keep their own id. Output: per cluster, cell count
    * and resident point count — all exact integers.
    *
    * Scale shape: one corpus-sized combinable groupBy(cell); the
    * adjacency self-join and component loop touch only the bounded
    * dense-cell frame. The grid extent sizes by the data
    * ([[gridCells]]), exactly the "grid sized by data extent" this
    * Scaladoc promised before r11 made it real. */
  def dbscanQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = gridCells(nCustomers(s, dir))
    val dense = points(s, dir, cells)
      .groupBy($"cx", $"cy").agg(count(lit(1)).as("n"))
      .filter($"n" >= MinPts)
      .withColumn("cell", $"cx" * cells + $"cy")
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1 if !(dx == 0 && dy == 0))
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
    val adj = dense
      .select($"cell".as("doc_a"), $"cx", $"cy",
        explode(array(offsets: _*)).as("o"))
      .select($"doc_a", ($"cx" + $"o.dx").as("kx"), ($"cy" + $"o.dy").as("ky"))
      .join(dense.select($"cell".as("doc_b"), $"cx".as("kx"),
        $"cy".as("ky")), Seq("kx", "ky"))
      .select($"doc_a", $"doc_b")
    val labels = Graph.connectedComponentsStar(adj)
    dense.join(labels, dense("cell") === labels("id"), "left")
      .select($"cell", coalesce($"label", $"cell").as("cluster"), $"n")
      .groupBy($"cluster")
      .agg(count(lit(1)).as("n_cells"), sum($"n").as("n_points"))
      .orderBy($"cluster")
  }

  val dbscanSql: String =
    s"""WITH RECURSIVE $ptsSql,
      |dense AS (
      |  SELECT xi // 100 AS cx, yi // 100 AS cy,
      |    (xi // 100) * g.cells + yi // 100 AS cell,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM pts CROSS JOIN g GROUP BY 1, 2, 3 HAVING COUNT(*) >= $MinPts),
      |adj AS (
      |  SELECT a.cell AS ca, b.cell AS cb
      |  FROM dense a JOIN dense b
      |    ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
      |    AND a.cell <> b.cell),
      |reach(c, r) AS (
      |  SELECT cell, cell FROM dense
      |  UNION
      |  SELECT w.c, adj.cb FROM reach w JOIN adj ON adj.ca = w.r),
      |lab AS (SELECT c AS cell, MIN(r) AS cluster FROM reach GROUP BY c)
      |SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_cells,
      |  CAST(SUM(n) AS BIGINT) AS n_points
      |FROM dense JOIN lab USING (cell)
      |GROUP BY cluster ORDER BY cluster""".stripMargin

  /** q_join_nn_radius entry: DIRECTED nearest-neighbor-within-radius
    * join — for EVERY point, its single closest other point at
    * distance ≤ 1.0 unit (ties → smaller neighbor id), the "snap each
    * record to its nearest station/store/anchor" lookup that differs
    * from [[spatialQ]]'s pair enumeration in two ways: it is directed
    * (each point owns one answer row) and it reduces candidates to an
    * argmin instead of emitting them.
    *
    * The bounded-radius contract is what makes EXACT grid search
    * possible at scale: a 1.0-unit radius with 1.0-unit cells means
    * the true NN (if any) lives in the 3×3 cell neighborhood, so the
    * argmin over those candidates is provably the global
    * within-radius argmin — no iterative ring expansion, no
    * approximation. Unbounded all-points NN needs the ring walk;
    * pipelines choose a radius cap precisely to stay in this shape.
    *
    * Scale shape: one exchange keyed on cell id; candidates ∝ local
    * density × 9 cells, with density pinned by [[gridCells]]; the
    * per-point argmin is a map-side-combinable `min(struct(dist², id))`
    * — no window, no candidate shuffle to a single task. Integer-
    * hundredth arithmetic end-to-end (the [[points]] contract), so
    * both engines agree exactly. */
  def nnRadiusQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pts = points(s, dir, gridCells(nCustomers(s, dir)))
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
    val probes = pts
      .select($"id".as("id_a"), $"xi".as("xa"), $"yi".as("ya"),
        explode(array(offsets: _*)).as("o"), $"cx", $"cy")
      .select($"id_a", $"xa", $"ya",
        ($"cx" + $"o.dx").as("kx"), ($"cy" + $"o.dy").as("ky"))
    probes
      .join(pts.select($"id".as("id_b"), $"xi".as("xb"), $"yi".as("yb"),
          $"cx".as("kx"), $"cy".as("ky")),
        Seq("kx", "ky"))
      .filter($"id_a" =!= $"id_b")
      .withColumn("dist2_h2",
        ($"xa" - $"xb") * ($"xa" - $"xb") + ($"ya" - $"yb") * ($"ya" - $"yb"))
      .filter($"dist2_h2" <= RadiusH * RadiusH)
      .groupBy($"id_a".as("id"))
      .agg(min(struct($"dist2_h2", $"id_b")).as("nn"))
      .select($"id", $"nn.id_b".as("nn_id"), $"nn.dist2_h2".as("dist2_h2"))
      .orderBy($"id")
  }

  val nnRadiusSql: String =
    s"""WITH $ptsSql,
      |cells AS (SELECT id, xi, yi, xi // 100 AS cx, yi // 100 AS cy
      |          FROM pts),
      |probes AS (
      |  SELECT id AS id_a, xi AS xa, yi AS ya,
      |    cx + o.dx AS kx, cy + o.dy AS ky
      |  FROM cells CROSS JOIN (
      |    SELECT dx.x AS dx, dy.x AS dy
      |    FROM (SELECT unnest([-1, 0, 1]) AS x) dx,
      |         (SELECT unnest([-1, 0, 1]) AS x) dy) o),
      |cand AS (
      |  SELECT p.id_a, c.id AS id_b,
      |    (p.xa - c.xi) * (p.xa - c.xi) + (p.ya - c.yi) * (p.ya - c.yi)
      |      AS dist2_h2
      |  FROM probes p JOIN cells c ON p.kx = c.cx AND p.ky = c.cy
      |    AND p.id_a <> c.id
      |  WHERE (p.xa - c.xi) * (p.xa - c.xi) + (p.ya - c.yi) * (p.ya - c.yi)
      |    <= ${RadiusH * RadiusH})
      |SELECT id_a AS id, id_b AS nn_id, dist2_h2 FROM (
      |  SELECT id_a, id_b, dist2_h2,
      |    ROW_NUMBER() OVER (PARTITION BY id_a
      |      ORDER BY dist2_h2, id_b) AS rn
      |  FROM cand)
      |WHERE rn = 1 ORDER BY id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_spatial" -> spatialQ,
    "q_join_nn_radius" -> nnRadiusQ,
    "q_cluster_dbscan" -> dbscanQ)

  def oracle: Map[String, String] = Map(
    "q_join_spatial" -> spatialSql,
    "q_join_nn_radius" -> nnRadiusSql,
    "q_cluster_dbscan" -> dbscanSql)
}
