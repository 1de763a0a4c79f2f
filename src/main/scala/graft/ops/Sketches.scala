package graft.ops

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches — the incremental-ingest shape for
  * cardinality tracking at 100 TB. `approx_count_distinct`
  * (q_agg_approx_distinct) answers "how many distinct NOW" with one
  * pass; this module materializes the sketch ITSELF (Spark's
  * DataSketches-backed HLL, binary-typed) as a durable per-source
  * artifact, because at scale the question is incremental: yesterday's
  * corpus is 100 TB you must not rescan, so yesterday IS a KB-sized
  * sketch row and today's batch unions into it —
  * `hll_union_agg` is associative and commutative, so daily/sourcewise
  * sketches merge in any order, across any partitioning, on any worker.
  *
  * Correctness gate, not a printed estimate: like the ANN recall gates
  * ([[Similarity]]), the query re-derives the EXACT distinct count
  * in-plan and emits a boolean per group asserting the estimate lands
  * within the sketch's error envelope (lgConfigK = 12 → RSE ≈ 1.04 /
  * √2¹² ≈ 1.6%; the gate allows 5% or ±2 absolute for tiny groups,
  * where dense-mode HLL is exact anyway). The DuckDB twin computes the
  * exact counts and expects every gate true — sketch bytes never cross
  * engines (DuckDB's own HLL is a different implementation; the
  * CONTRACT is the error envelope, which is the portable statement).
  *
  * Artifact pattern matches [[Similarity.IvfArtifact]] /
  * [[Dedup.PairArtifact]]: built once per JVM, persisted as parquet,
  * consumers pay a KB-sized read. */
object Sketches {

  /** Per-source HLL sketches of the distinct token population:
    * (source, sk binary, n_rows). One scan-speed aggregate; the result
    * is O(sources) rows × ~KB regardless of corpus size. */
  def tokenSketches(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"source", explode(split(lower($"text"), " ")).as("tok"))
      .groupBy($"source")
      .agg(hll_sketch_agg($"tok", lit(12)).as("sk"),
        count(lit(1)).as("n_tokens"))
  }

  /** Built once per JVM, persisted as parquet — the durable form a
    * pipeline stores per ingestion batch and re-merges forever after. */
  private object SketchArtifact {
    private lazy val root =
      java.nio.file.Files.createTempDirectory("graft-hll-").toString
    private val built = scala.collection.mutable.HashMap.empty[String, String]
    def of(s: SparkSession, dir: String): DataFrame = synchronized {
      val p = built.getOrElseUpdate(dir, {
        val path = s"$root/${Integer.toHexString(dir.hashCode)}"
        tokenSketches(s, dir).write.mode("overwrite").parquet(path)
        path
      })
      s.read.parquet(p)
    }
  }

  /** q_agg_hll_merge entry: estimates from the persisted per-source
    * sketches, a global estimate from their union, and an in-plan gate
    * against the exact distinct counts. Output is engine-portable:
    * (source, n_exact, est_ok) — the estimate itself stays internal. */
  def hllMergeQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sk = SketchArtifact.of(s, dir)
    val perSource = sk.select($"source", hll_sketch_estimate($"sk").as("est"))
    val global = sk.agg(hll_union_agg($"sk").as("sk"))
      .select(lit("ALL").as("source"), hll_sketch_estimate($"sk").as("est"))
    val toks = t(s, dir, "documents")
      .select($"source", explode(split(lower($"text"), " ")).as("tok"))
    val exactPer = toks.groupBy($"source")
      .agg(countDistinct($"tok").as("n_exact"))
    val exactAll = toks.agg(countDistinct($"tok").as("n_exact"))
      .select(lit("ALL").as("source"), $"n_exact")
    perSource.unionByName(global)
      .join(exactPer.unionByName(exactAll), "source")
      .select($"source", $"n_exact",
        (abs($"est" - $"n_exact").cast("double") <=
          greatest(lit(2d), $"n_exact" * 0.05)).cast("int").as("est_ok"))
      .orderBy($"source")
  }

  /** DuckDB twin: exact distinct counts; every envelope gate must hold. */
  val hllMergeSql: String =
    """WITH e AS (SELECT source, unnest(string_split(lower(text), ' ')) AS tok
      |  FROM documents),
      |per AS (SELECT source, COUNT(DISTINCT tok) AS n_exact FROM e GROUP BY source),
      |allr AS (SELECT 'ALL' AS source, COUNT(DISTINCT tok) AS n_exact FROM e)
      |SELECT source, n_exact, 1 AS est_ok FROM per
      |UNION ALL SELECT source, n_exact, 1 AS est_ok FROM allr
      |ORDER BY source""".stripMargin

  /** Cross-source VOCABULARY overlap matrix — the token-level
    * complement of [[Dedup]]'s doc-level source matrix: for every
    * source pair, the exact distinct-token intersection and its Jaccard
    * similarity. High vocab overlap between two crawl feeds flags
    * mirrored content before any document-level dedup runs — the cheap
    * early-warning the sketch family approximates and this query pins
    * exactly.
    *
    * Scale shape: the corpus collapses to DISTINCT (source, token)
    * first (map-side-combinable; vocabulary-bounded rows per source),
    * the pair join is keyed by token with per-token fan-out ≤
    * |sources|² — never a corpus scan on the join side — and the
    * per-source totals arrive by broadcast. */
  def sourceOverlapQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "documents")
      .select($"source", explode(split(lower($"text"), " ")).as("tok"))
      .distinct()
    val per = e.groupBy($"source").agg(countDistinct($"tok").as("n"))
    val pairs = e.as("a").join(e.as("b"),
        $"a.tok" === $"b.tok" && $"a.source" < $"b.source")
      .groupBy($"a.source".as("s1"), $"b.source".as("s2"))
      .agg(count(lit(1)).as("n_common")) // (source, tok) rows are distinct
    pairs
      .join(broadcast(per.select($"source".as("s1"), $"n".as("n1"))), "s1")
      .join(broadcast(per.select($"source".as("s2"), $"n".as("n2"))), "s2")
      .select($"s1", $"s2", $"n_common", $"n1", $"n2",
        round($"n_common".cast("double") /
          ($"n1" + $"n2" - $"n_common"), 6).as("jaccard"))
      .orderBy($"s1", $"s2")
  }

  val sourceOverlapSql: String =
    """WITH e AS (SELECT DISTINCT source, tok FROM
      |  (SELECT source, unnest(string_split(lower(text), ' ')) AS tok
      |   FROM documents)),
      |per AS (SELECT source, COUNT(*) AS n FROM e GROUP BY source),
      |p AS (SELECT a.source AS s1, b.source AS s2,
      |    CAST(COUNT(*) AS BIGINT) AS n_common
      |  FROM e a JOIN e b ON a.tok = b.tok AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT s1, s2, n_common, x.n AS n1, y.n AS n2,
      |  ROUND(CAST(n_common AS DOUBLE) / (x.n + y.n - n_common), 6) AS jaccard
      |FROM p JOIN per x ON p.s1 = x.source JOIN per y ON p.s2 = y.source
      |ORDER BY s1, s2""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_hll_merge" -> hllMergeQ,
    "q_source_overlap" -> sourceOverlapQ)

  def oracle: Map[String, String] = Map(
    "q_agg_hll_merge" -> hllMergeSql,
    "q_source_overlap" -> sourceOverlapSql)
}
